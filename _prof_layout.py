import time, jax, jax.numpy as jnp
R = 786432
def bench(f, *a, n=20):
    o=f(*a); o.block_until_ready(); o=f(*a); o.block_until_ready()
    t0=time.perf_counter()
    for _ in range(n): o=f(*a)
    o.block_until_ready()
    return (time.perf_counter()-t0)/n*1e3

k = jax.random.PRNGKey(0)
a3 = jax.random.uniform(k, (R,3)); b3 = a3+1; c3 = a3+2
aT = a3.T.copy(); bT = b3.T.copy(); cT = c3.T.copy()

@jax.jit
def rows(a,b,c):
    for _ in range(30):
        d = a*b+c
        s = jnp.sum(d*d, axis=-1, keepdims=True)
        a = d / jnp.sqrt(s)
    return a

@jax.jit
def cols(a,b,c):
    for _ in range(30):
        d = a*b+c
        s = jnp.sum(d*d, axis=0, keepdims=True)
        a = d / jnp.sqrt(s)
    return a

print("rows [R,3]  %.3f ms" % bench(rows, a3,b3,c3), flush=True)
print("cols [3,R]  %.3f ms" % bench(cols, aT,bT,cT), flush=True)
