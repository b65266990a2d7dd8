"""The chunked-CE head cotangent must be SHARDED in the partitioned program.

r5 TPU-topology finding (docs/production_compile_r5.jsonl, 8b_stage2_*):
with the lm_head closed over by the CE scan, lax.scan accumulated its
cotangent in a carry GSPMD kept replicated — a full fp32 [4096, 128256]
buffer (1.96 GiB) on EVERY device, the largest allocation of the failing
8B stage-2 buffer assignment. chunked_cross_entropy now takes the head
explicitly and its custom_vjp accumulates under the param's sharding
constraint; this test AOT-compiles the real-geometry grad (abstract — no
weights materialize) on the 8-device mesh and asserts the full-size fp32
buffer does not appear in the compiled HLO while the sharded one does.
"""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cambrian_tpu.models.cambrian import chunked_cross_entropy
from cambrian_tpu.parallel.mesh import MeshConfig, create_mesh

H, V = 4096, 128256          # llama-3-8B head geometry
B, S, CHUNK = 8, 2048, 128   # global batch over the 8-device mesh


@pytest.mark.slow
def test_ce_head_grad_is_sharded_in_compiled_hlo():
    mesh = create_mesh(MeshConfig(data=1, fsdp=8, model=1))

    def logits_fn(head, hc):
        return hc.astype(jnp.float32) @ head.astype(jnp.float32)

    spec = (None, ("model", "fsdp"))  # the lm_head rule: vocab-sharded
    def loss(head, hidden, labels):
        return chunked_cross_entropy(hidden, labels, logits_fn, CHUNK,
                                     head, spec)

    grad = jax.grad(loss, argnums=(0, 1))
    sds = jax.ShapeDtypeStruct
    head_sh = NamedSharding(mesh, P(*spec))
    hid_sh = NamedSharding(mesh, P(("data", "fsdp"), None, None))
    lab_sh = NamedSharding(mesh, P(("data", "fsdp"), None))
    with jax.set_mesh(mesh):
        compiled = (
            jax.jit(grad, in_shardings=(head_sh, hid_sh, lab_sh))
            .lower(sds((H, V), jnp.float32), sds((B, S, H), jnp.bfloat16),
                   sds((B, S), jnp.int32))
            .compile()
        )
    txt = compiled.as_text()
    # per-device shapes: vocab-sharded accumulator/logits only; the
    # replicated (bug) form is the full [H, V] fp32, and an H-sharded rule
    # would force per-chunk [H, V] weight gathers (also full-size)
    assert not re.search(rf"f32\[{H},{V}\]", txt), (
        "full-size fp32 head buffer found — cotangent replicated or weight "
        "gathered")
    assert re.search(rf"f32\[{H},{V // 8}\]", txt), (
        "expected vocab-sharded head cotangent not found")
