"""Legacy eval CLI (val.py): end-to-end drive incl. the DataParallel-
equivalent --data_parallel flag (reference src/val.py:130-131)."""

import os

import numpy as np

from video_layout_generation_tpu.val import main


def test_val_cli_runs_and_exports(tmp_path, capsys):
    main(["--model", "u_net", "--bs", "4", "--size", "32",
          "--n_samples", "4", "--save_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "mIoU" in out
    pngs = [f for f in os.listdir(tmp_path / "u_net_eval_32x32")]
    assert len(pngs) == 4


def test_val_cli_data_parallel_matches_single(tmp_path, capsys):
    """--data_parallel shards the batch over the 8-device test mesh; the
    metric line must equal the single-device run exactly."""
    main(["--model", "u_net", "--bs", "8", "--size", "32",
          "--n_samples", "8", "--save_dir", str(tmp_path / "a")])
    single = capsys.readouterr().out.splitlines()[-1]
    main(["--model", "u_net", "--bs", "8", "--size", "32",
          "--n_samples", "8", "--save_dir", str(tmp_path / "b"),
          "--data_parallel"])
    sharded = capsys.readouterr().out.splitlines()[-1]
    assert single == sharded and "mIoU" in single
