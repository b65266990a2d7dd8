"""Probe: can the axon TPU backend AOT-compile against a MULTI-chip v5e
topology descriptor (jax.experimental.topologies) with only one real chip?

If yes, tests/test_production_compile.py's CPU-backend rows can be re-run
with TPU-faithful temps (the CPU backend overstates workspace: int8 Pallas
matmul and flash attention fall back to XLA paths there).
"""
import sys


def main():
    import jax
    print("backend:", jax.devices())
    from jax.experimental import topologies
    for name in ("v5e:2x4", "v5litepod-8", "v5e-8", "2x4"):
        try:
            topo = topologies.get_topology_desc(
                platform="tpu", topology_name=name)
            print("OK topology:", name, "->", len(topo.devices), "devices")
            devs = topo.devices
            import jax.numpy as jnp
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            import numpy as np
            mesh = Mesh(np.array(devs).reshape(2, 4), ("a", "b"))
            sh = NamedSharding(mesh, P("a", "b"))

            def f(x):
                return (x @ x.T).sum()

            x = jax.ShapeDtypeStruct((1024, 1024), jnp.bfloat16, sharding=sh)
            compiled = jax.jit(f).lower(x).compile()
            ma = compiled.memory_analysis()
            print("compiled; temp bytes:", ma.temp_size_in_bytes)
            return 0
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
