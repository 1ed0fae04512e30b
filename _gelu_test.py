import time
import jax, jax.numpy as jnp
M, F = 17152, 3072
def tmin(fn, n=5):
    float(fn(0)); best=1e9
    for i in range(1,n+1):
        t0=time.time(); float(fn(i)); best=min(best,time.time()-t0-0.025)
    return best
y0 = jax.random.normal(jax.random.PRNGKey(0), (M, F), jnp.bfloat16)

def bench(name, f):
    @jax.jit
    def run(y, s):
        y = y + s
        for i in range(12):
            y = f(y)*1.0001
        return y.astype(jnp.float32).sum()
    t = tmin(lambda i: run(y0, jnp.bfloat16(i)))
    print(f"{name:24s} {t*1e3:6.2f} ms")

def erf_as(x):
    x32 = x.astype(jnp.float32)
    t = 1.0/(1.0+0.3275911*jnp.abs(x32))
    poly = t*(0.254829592+t*(-0.284496736+t*(1.421413741+t*(-1.453152027+t*1.061405429))))
    return (jnp.sign(x32)*(1.0-poly*jnp.exp(-x32*x32))).astype(x.dtype)

bench("gelu exact (erf)", lambda y: jax.nn.gelu(y, approximate=False))
bench("gelu tanh approx", lambda y: jax.nn.gelu(y, approximate=True))
bench("gelu A&S-erf", lambda y: 0.5*y*(1.0+erf_as(y*jnp.bfloat16(0.70710678))))
bench("sigmoid-gelu (x*sig(1.702x))", lambda y: y*jax.nn.sigmoid(1.702*y))
bench("relu (floor)", jax.nn.relu)
# backward too
def bench_grad(name, f):
    @jax.jit
    def run(y, s):
        def loss(y):
            z = y + s
            for i in range(12):
                z = f(z)*1.0001
            return z.astype(jnp.float32).sum()
        return jax.grad(loss)(y).astype(jnp.float32).sum()
    t = tmin(lambda i: run(y0, jnp.bfloat16(i)))
    print(f"grad {name:19s} {t*1e3:6.2f} ms")
bench_grad("gelu exact", lambda y: jax.nn.gelu(y, approximate=False))
bench_grad("gelu tanh", lambda y: jax.nn.gelu(y, approximate=True))
