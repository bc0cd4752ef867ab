"""Bisect the colorfield fwd+bwd cost on TPU."""
import sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from aip_tpu.gs import colorfield as CF

def sync(x):
    np.asarray(jax.lax.slice(jnp.ravel(x), (0,), (1,)))

def bench(label, f, *a, iters=5):
    t0 = time.time(); out = f(*a); sync(jax.tree.leaves(out)[0])
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    sync(jax.tree.leaves(out)[0])
    print(f"{label:40s}: {(time.time()-t0)/iters*1000:8.1f} ms (compile {c:.0f}s)")

n = 131072
params = CF.init_colorfield(jax.random.PRNGKey(0), style_dim=256, log2_hashmap=19)
xyz = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
style_f = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
g48 = jax.random.normal(jax.random.PRNGKey(3), (n, 16, 3))
g32 = jax.random.normal(jax.random.PRNGKey(4), (n, 32))
x01 = CF.contract_to_unisphere(xyz)
enc0 = CF.hash_encode(params.hash_tables, x01)

# fwd only
bench("predict_sh fwd", jax.jit(lambda p: CF.predict_sh(p, xyz, style_f)), params)

# encode-only grad, contracted input
bench("encode grad (contracted x)",
      jax.jit(jax.grad(lambda t: jnp.sum(CF.hash_encode(t, x01) * g32))),
      params.hash_tables)

# MLP-only grad (enc fixed)
def mlp_loss(p):
    emb = CF.style_embedding(p, style_f)
    e = jnp.concatenate([enc0, jnp.broadcast_to(emb, (n, emb.shape[1]))], 1)
    h = jax.nn.relu(e @ p.mlp_w1 + p.mlp_b1)
    h = jax.nn.relu(h @ p.mlp_w2 + p.mlp_b2)
    return jnp.sum((h @ p.mlp_w3 + p.mlp_b3).reshape(-1, 16, 3) * g48)
bench("MLP+style grad (enc fixed)", jax.jit(jax.grad(mlp_loss)), params)

# full predict_sh grad
bench("predict_sh grad",
      jax.jit(jax.grad(lambda p: jnp.sum(CF.predict_sh(p, xyz, style_f) * g48))),
      params)

# predict_sh grad without style
params_ns = CF.init_colorfield(jax.random.PRNGKey(0), style_dim=None, log2_hashmap=19)
bench("predict_sh grad (no style)",
      jax.jit(jax.grad(lambda p: jnp.sum(CF.predict_sh(p, xyz, None) * g48))),
      params_ns)
