"""Child process for the multi-host simulation test (2 procs x 4 CPU devices).

Joins the distributed runtime, builds the (data, fsdp, model) mesh over all
8 GLOBAL devices, materializes the train state sharded across hosts (init
jitted with out_shardings — no host array ever spans processes), feeds the
batch through put_global_batch, and runs two real Cambrian train steps.

Run: python multiproc_child.py <process_id> <num_processes> <port> [local_devices]
``local_devices`` defaults to 4; pass 8 with num_processes=1 for the
single-process reference geometry (same 8-device global mesh, no DCN split).
Prints "proc <pid>: loss0=<x> loss1=<y> OK" on success.
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    local_devices = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cambrian_tpu.parallel.distributed import (
        initialize_distributed,
        put_global_batch,
    )

    assert initialize_distributed(f"localhost:{port}", nproc, pid)
    assert jax.local_device_count() == local_devices, jax.local_device_count()
    assert jax.device_count() == local_devices * nproc, jax.device_count()

    import numpy as np

    import __graft_entry__
    from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh
    from cambrian_tpu.parallel.sharding import infer_param_shardings
    from cambrian_tpu.train.optimizer import TrainConfig
    from cambrian_tpu.train.train_step import (
        batch_shardings,
        init_train_state,
        make_train_step,
        state_shardings,
    )

    mesh = create_mesh(MeshConfig(data=2, fsdp=2, model=2))
    cfg, model, towers, _, _, batch = __graft_entry__._build(batch=8)
    batch = {k: jax.tree.map(np.asarray, v) for k, v in batch.items()}
    tconf = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
                        lr_scheduler_type="constant")

    def init_fn():
        tower_params = [t.init(jax.random.PRNGKey(i + 1))
                        for i, t in enumerate(towers)]
        feats = [t.apply(tp, jax.numpy.asarray(px))
                 for t, tp, px in zip(towers, tower_params, batch["images"])]
        params = model.init(
            jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
            batch["position_ids"], feats, batch["aux_masks"],
        )
        return init_train_state(params, tconf), tower_params

    with jax.set_mesh(mesh):
        state_shape, tower_shape = jax.eval_shape(init_fn)
        state_sh = state_shardings(state_shape, mesh)
        tower_sh = [infer_param_shardings(tp, mesh) for tp in tower_shape]
        state, tower_params = jax.jit(
            init_fn, out_shardings=(state_sh, tower_sh))()

        batch_sh = batch_shardings(mesh, num_towers=len(towers))
        gbatch = put_global_batch(batch, batch_sh)

        step_fn = make_train_step(model, towers)
        jstep = jax.jit(step_fn, in_shardings=(state_sh, tower_sh, batch_sh),
                        out_shardings=(state_sh, None))
        state, m0 = jstep(state, tower_params, gbatch)
        state, m1 = jstep(state, tower_params, gbatch)
        loss0, loss1 = float(m0["loss"]), float(m1["loss"])

    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)  # same batch twice: loss must drop
    print(f"proc {pid}: loss0={loss0:.4f} loss1={loss1:.4f} OK", flush=True)


if __name__ == "__main__":
    main()
