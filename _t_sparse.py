import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from montecarlo_pathtracing_tpu.scene import scenes
from montecarlo_pathtracing_tpu.scene.device import compile_scene
from montecarlo_pathtracing_tpu.ops.trace import trace_soa, trace
from montecarlo_pathtracing_tpu.ops import vec

for name in ("colonnes", "mesh_demo"):
    dev = compile_scene(scenes.build(name))
    M = 2048
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    o = tuple(jax.random.uniform(k[i], (M,), jnp.float32, -30., 30.) for i in range(3))
    dd = tuple(jax.random.normal(k[3+i], (M,), jnp.float32) for i in range(3))
    n = jnp.sqrt(dd[0]**2+dd[1]**2+dd[2]**2)
    d = tuple(c/n for c in dd)
    h_sparse = trace_soa(dev, o, d, interpret=True)            # worklist route
    h_brute  = trace_soa(dev, o, d, interpret=True, cull_chunks=False)
    h_dense  = trace(dev, vec.to_aos(o), vec.to_aos(d))
    for fname in ("dist","prim","shape","tri"):
        a = np.asarray(getattr(h_sparse, fname)); b = np.asarray(getattr(h_brute, fname))
        c = np.asarray(getattr(h_dense, fname))
        print(name, fname, "sparse==brute:", np.array_equal(a,b), " sparse==dense:", np.array_equal(a,c))
