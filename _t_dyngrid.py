import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(tid_ref, x_ref, o_ref):
    w = pl.program_id(0)
    first = jnp.logical_or(w == 0, tid_ref[jnp.maximum(w-1,0)] != tid_ref[w])
    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref[...])
    o_ref[...] += x_ref[...]

@jax.jit
def run(x, tid, n):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((8,128), lambda w,t: (t[w],0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8,128), lambda w,t: (t[w],0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(tid, x)

x = jnp.ones((32, 128), jnp.float32)   # 4 tiles of (8,128)
tid = jnp.array([0,0,1,2,2,3]+[3]*10, jnp.int32)
try:
    r = run(x, tid, jnp.int32(6))
    print("dynamic grid OK:", r[::8,0])   # expect [2,1,2,1]
except Exception as e:
    print("dynamic grid FAILED:", type(e).__name__, str(e)[:300])
