"""Snapshot-runner behavior (reference src/runner.py:34-50): copy the source
tree into ../playground/<run_name>/<dirname>, execute the command there with
``run_name`` exported, propagate its exit code, and refuse/honor overwrite."""

import pathlib

from video_layout_generation_tpu.runner import snapshot_and_run


def _make_tree(tmp_path):
    src = tmp_path / "proj"
    (src / "sub").mkdir(parents=True)
    (src / "code.py").write_text("x = 1\n")
    (src / "sub" / "data.txt").write_text("d\n")
    (src / "__pycache__").mkdir()
    (src / "__pycache__" / "junk.pyc").write_text("j")
    return src


def test_snapshot_exec_and_exit_code(tmp_path):
    src = _make_tree(tmp_path)
    rc = snapshot_and_run(
        "exp1", "echo $run_name > ran.txt", src_dir=src)
    assert rc == 0
    dst = tmp_path / "playground" / "exp1" / "proj"
    # tree snapshot, caches excluded, command ran IN the snapshot with
    # run_name in env
    assert (dst / "code.py").read_text() == "x = 1\n"
    assert (dst / "sub" / "data.txt").exists()
    assert not (dst / "__pycache__").exists()
    assert (dst / "ran.txt").read_text().strip() == "exp1"
    # exit code propagation
    assert snapshot_and_run("exp2", "exit 7", src_dir=src) == 7


def test_snapshot_overwrite_force(tmp_path):
    src = _make_tree(tmp_path)
    assert snapshot_and_run("exp", "true", src_dir=src) == 0
    marker = tmp_path / "playground" / "exp" / "proj" / "ran.txt"
    assert not marker.exists()
    # force=True replaces the existing run dir without prompting
    assert snapshot_and_run("exp", "touch ran.txt", force=True,
                            src_dir=src) == 0
    assert marker.exists()


def test_snapshot_excludes_nested_playground(tmp_path):
    # the playground lives NEXT TO the source dir; a stale nested one
    # inside the source must not be copied into the snapshot
    src = _make_tree(tmp_path)
    (src / "playground").mkdir()
    (src / "playground" / "old.txt").write_text("o")
    assert snapshot_and_run("exp3", "true", src_dir=src) == 0
    assert not (tmp_path / "playground" / "exp3" / "proj"
                / "playground").exists()
