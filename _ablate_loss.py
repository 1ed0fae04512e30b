"""Isolate the alignment-loss cost at B=128 (throwaway)."""
import time
import jax, jax.numpy as jnp
import aladin_tpu.ops.losses as L
from aladin_tpu.ops.alignment import alignment_scores

B, R, W, D = 128, 34, 50, 768
k = jax.random.PRNGKey(0)
im = jax.random.normal(k, (B, R, D), jnp.float32)
im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
ss = jax.random.normal(jax.random.fold_in(k,1), (B, W, D), jnp.float32)
ss = ss / jnp.linalg.norm(ss, axis=-1, keepdims=True)
il = jnp.full((B,), R, jnp.int32); sl = jnp.full((B,), W, jnp.int32)
ig = im[:,0]; cg = ss[:,0]

def tmin(fn, n=5):
    float(fn(0)); best = 1e9
    for i in range(1, n+1):
        t0=time.time(); float(fn(i)); best=min(best, time.time()-t0-0.025)
    return best

# full loss fwd (alignment + matching + distillation listnet)
@jax.jit
def loss_fwd(im, ss, e):
    al, sc = L.alignment_contrastive_loss(im+e*0, ss, il, sl, normalized=True)
    ml, mm = L.matching_loss(ig, cg, 0.2, "dot", True)
    dl = L.distillation_loss(jax.lax.stop_gradient(sc), mm, "listnet")
    return al + ml + dl
t = tmin(lambda i: loss_fwd(im, ss, jnp.float32(i)))
print(f"loss fwd (f32 sets)        {t*1e3:7.2f} ms")

# grad of full loss
g = jax.jit(lambda im, ss, e: jax.grad(
    lambda a, b: loss_fwd(a, b, e))(im, ss)[0].sum())
t = tmin(lambda i: g(im, ss, jnp.float32(i)))
print(f"loss fwd+bwd (f32 sets)    {t*1e3:7.2f} ms")

# alignment scores alone, f32 vs bf16 inputs
f1 = jax.jit(lambda a, b, e: alignment_scores(a+e*0, b, il, sl, normalized=True).sum())
t = tmin(lambda i: f1(im, ss, jnp.float32(i)))
print(f"align scores fwd f32       {t*1e3:7.2f} ms")
imb, ssb = im.astype(jnp.bfloat16), ss.astype(jnp.bfloat16)
t = tmin(lambda i: f1(imb, ssb, jnp.bfloat16(i)))
print(f"align scores fwd bf16      {t*1e3:7.2f} ms")
g1 = jax.jit(lambda a, b, e: jax.grad(
    lambda x, y: alignment_scores(x+e*0, y, il, sl, normalized=True).sum())(a, b)[0].astype(jnp.float32).sum())
t = tmin(lambda i: g1(im, ss, jnp.float32(i)))
print(f"align scores fwd+bwd f32   {t*1e3:7.2f} ms")
t = tmin(lambda i: g1(imb, ssb, jnp.bfloat16(i)))
print(f"align scores fwd+bwd bf16  {t*1e3:7.2f} ms")
