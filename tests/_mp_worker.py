"""Worker for the REAL multi-process distributed test (not pytest-collected).

Runs the actual product path — HostLoader(process sharding) ->
ShardedLoader(make_array_from_process_local_data) -> jitted train step ->
validate-style global aggregation — inside a genuine
``jax.distributed.initialize`` process group over localhost (Gloo CPU
collectives), the TPU-native successor of the reference's NCCL TCP
rendezvous (reference src/main.py:53-54). The pytest driver
(tests/test_multiprocess_real.py) launches N of these and asserts the
training trajectory and validation metrics are process-count invariant.

  python tests/_mp_worker.py <pid> <nproc> <port> <out.json> [family]

``family`` selects the step family under the live process group:
  plain (default)  single-step reference objective (train/steps.py)
  multistep        K=2 BPTT window objective (train/multistep.py)
  gan              fused G/D adversarial step (train/gan.py)

Env: XLA_FLAGS must force 2 host devices (the driver sets it).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    family = sys.argv[5] if len(sys.argv) > 5 else "plain"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("VLG_TEST_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid and jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    from video_layout_generation_tpu.data.pipeline import (HostLoader,
                                                           ShardedLoader)
    from video_layout_generation_tpu.data.synthetic import SyntheticTriplets
    from video_layout_generation_tpu.losses.combined import CombinedLoss
    from video_layout_generation_tpu.models import GridNet
    from video_layout_generation_tpu.parallel.mesh import (
        compile_then_barrier, is_primary, make_mesh)
    from video_layout_generation_tpu.train.state import (TrainState,
                                                         make_optimizer)
    from video_layout_generation_tpu.train.steps import (make_eval_step,
                                                         make_train_step)

    hw = 16
    model = GridNet(n_channels=8, filters_level=(4, 6, 8))
    combined = CombinedLoss.create(image_hw=(hw, hw))
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, hw, hw, 8)))
    state = TrainState.create(params, make_optimizer("adam", 2e-4, 0.5))
    if family == "plain":
        step = make_train_step(model.apply, None, combined, donate=False)
        n_frames = 3
    elif family == "multistep":
        from video_layout_generation_tpu.train.multistep import \
            make_multistep_train_step
        step = make_multistep_train_step(model.apply, None, combined, k=2,
                                         donate=False)
        n_frames = 4
    elif family == "gan":
        from video_layout_generation_tpu.models.discriminators import \
            PixelDiscriminator
        from video_layout_generation_tpu.train.gan import (GanTrainState,
                                                           make_gan_train_step)
        disc = PixelDiscriminator(input_nc=9, ndf=8, norm="instance")
        d_params = jax.jit(disc.init)(jax.random.key(1),
                                      jnp.zeros((1, hw, hw, 9)))
        state = GanTrainState(
            gen=state,
            disc=TrainState.create(d_params,
                                   make_optimizer("adam", 2e-4, 0.5)))
        step = make_gan_train_step(model.apply, disc.apply, None, combined,
                                   "lsgan", donate=False)
        n_frames = 3
    else:
        raise SystemExit(f"unknown family {family!r}")
    eval_step = make_eval_step(model.apply, None, combined.eval_variant(),
                               n_classes=20)

    mesh = make_mesh()  # all GLOBAL devices on the 'data' axis
    ds = SyntheticTriplets(16, (hw, hw), 20, n_frames=n_frames)
    val_ds = SyntheticTriplets(16, (hw, hw), 20)
    # global batch 8 == local 8/nproc per process (reference bs//gpus split,
    # src/trainer.py:148)
    train_loader = ShardedLoader(
        HostLoader(ds, 8 // nproc, seed=3, workers=1,
                   process_index=pid, process_count=nproc), mesh)
    val_loader = ShardedLoader(
        HostLoader(val_ds, 8 // nproc, shuffle=False, workers=1,
                   process_index=pid, process_count=nproc), mesh)

    def gen_params(st):
        return st.gen.params if family == "gan" else st.params

    losses = []
    with jax.set_mesh(mesh):
        # AOT-compile BOTH cross-process programs before the first collective
        # execution: Gloo's context init has a 30 s KV deadline, and a peer
        # still inside a cold single-core XLA compile blows it. Compile is
        # local; the barrier synchronizes entry into the first collective.
        train_loader.set_epoch(0)
        first = next(iter(train_loader))
        key0 = jax.random.fold_in(jax.random.key(42), 0)
        step_x = compile_then_barrier(step, state, None, first, key0,
                                      name="train_step_compiled")
        val_loader.set_epoch(0)
        first_val = next(iter(val_loader))
        eval_x = compile_then_barrier(eval_step, gen_params(state), None,
                                      first_val, name="eval_step_compiled")

        for epoch in range(2):
            train_loader.set_epoch(epoch)
            for i, batch in enumerate(train_loader):
                key = jax.random.fold_in(jax.random.key(42), epoch * 100 + i)
                state, metrics = step_x(state, None, batch, key)
                losses.append(float(metrics["loss"]))

        # validate-style global aggregation (reference size-weighted
        # all_reduce, src/trainer.py:336-340): reductions happen inside the
        # jitted eval step over the global batch and come back replicated
        loss_sum, n, cm_total = 0.0, 0, np.zeros((20, 20))
        for batch in val_loader:
            m, _, _ = eval_x(gen_params(state), None, batch)
            bs = next(iter(jax.tree_util.tree_leaves(batch))).shape[0]
            loss_sum += float(m["loss"]) * bs
            n += bs
            cm_total = cm_total + np.asarray(m["cm"])

    param_sum = float(sum(jnp.sum(jnp.abs(p)).astype(jnp.float64)
                          for p in jax.tree_util.tree_leaves(
                              gen_params(state))))
    result = {"pid": pid, "nproc": nproc, "primary": is_primary(),
              "losses": losses, "val_loss": loss_sum / n,
              "cm_trace": float(np.trace(cm_total)),
              "cm_sum": float(cm_total.sum()), "param_sum": param_sum}
    with open(out, "w") as f:
        json.dump(result, f)
    print("WORKER_DONE", pid, flush=True)


if __name__ == "__main__":
    main()
