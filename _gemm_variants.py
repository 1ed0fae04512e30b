import time
import jax, jax.numpy as jnp

M, D, F, B, H, L, d = 17152, 768, 3072, 128, 12, 84, 64
def tmin(fn, n=5):
    float(fn(0)); best=1e9
    for i in range(1,n+1):
        t0=time.time(); float(fn(i)); best=min(best,time.time()-t0-0.025)
    return best

key = jax.random.PRNGKey(0)
x0 = jax.random.normal(key, (M, D), jnp.bfloat16)
mk = lambda i, s: jax.random.normal(jax.random.PRNGKey(i), s, jnp.bfloat16)*0.02

# A) separate QKV (baseline shape)
Ws = [(mk(100+i,(D,D)), mk(200+i,(D,D)), mk(300+i,(D,D)), mk(400+i,(D,D)),
       mk(500+i,(D,F)), mk(600+i,(F,D))) for i in range(12)]
@jax.jit
def sep(x, s):
    x = x + s
    for q,k_,v,o,u,dn in Ws:
        a = x@q + x@k_ + x@v
        x = x + a@o*0.01
        x = x + (x@u)@dn*0.01
    return x.astype(jnp.float32).sum()
t = tmin(lambda i: sep(x0, jnp.bfloat16(i)))
fl = 2*M*12*(4*D*D+2*D*F)
print(f"separate QKV   {t*1e3:6.2f} ms {fl/t/1e12:6.1f} TF/s")

# B) fused QKV
Wf = [(mk(700+i,(D,3*D)), mk(400+i,(D,D)), mk(500+i,(D,F)), mk(600+i,(F,D)))
      for i in range(12)]
@jax.jit
def fus(x, s):
    x = x + s
    for qkv,o,u,dn in Wf:
        a = x@qkv
        x = x + a[:, :D]@o*0.01 + a[:, D:2*D]@o*0.001 + a[:, 2*D:]@o*0.0001
        x = x + (x@u)@dn*0.01
    return x.astype(jnp.float32).sum()
t = tmin(lambda i: fus(x0, jnp.bfloat16(i)))
print(f"fused QKV      {t*1e3:6.2f} ms {fl/t/1e12:6.1f} TF/s")

# C) attention block alone, 24 pass-layers (12 layers x 2 passes at B=128)
q0 = jax.random.normal(key, (B, L, H, d), jnp.bfloat16)
bias = jnp.zeros((B, 1, 1, L), jnp.float32)
@jax.jit
def attn(q, s):
    x = q + s
    for i in range(24):
        sc = jnp.einsum("bqhd,bkhd->bhqk", x, x, preferred_element_type=jnp.float32)
        sc = sc/8.0 + bias
        p = jax.nn.softmax(sc, axis=-1).astype(jnp.bfloat16)
        x = jnp.einsum("bhqk,bkhd->bqhd", p, x) * 0.01 + x
    return x.astype(jnp.float32).sum()
t = tmin(lambda i: attn(q0, jnp.bfloat16(i)))
afl = 24*2*2*B*H*L*L*d
print(f"attention x24  {t*1e3:6.2f} ms {afl/t/1e12:6.1f} TF/s ({afl/1e9:.1f} GF)")

# D) LayerNorm x48 over (M, D) (24 per pass-pair x 2)
import flax.linen as nn
ln = nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16)
p_ln = ln.init(key, x0)
@jax.jit
def lns(x, s):
    x = x + s
    for i in range(48):
        x = ln.apply(p_ln, x)
    return x.astype(jnp.float32).sum()
t = tmin(lambda i: lns(x0, jnp.bfloat16(i)))
print(f"layernorm x48  {t*1e3:6.2f} ms")

# E) gelu x12 over (M, F)
y0 = jax.random.normal(key, (M, F), jnp.bfloat16)
@jax.jit
def gl(y, s):
    y = y + s
    for i in range(12):
        y = jax.nn.gelu(y, approximate=False)*1.0001
    return y.astype(jnp.float32).sum()
t = tmin(lambda i: gl(y0, jnp.bfloat16(i)))
print(f"gelu x12       {t*1e3:6.2f} ms")
