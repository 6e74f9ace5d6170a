"""Fresh-array readback cost: two outputs vs one packed output."""
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
Q, k = 10_000, 12
key = jax.random.PRNGKey(0)
base = jax.random.normal(key, (Q, k), jnp.float32)
jax.block_until_ready(base)


@jax.jit
def two(x, s):
    y = x + s
    return y, (y * 2).astype(jnp.int32)


@jax.jit
def one(x, s):
    y = x + s
    return jnp.stack([jax.lax.bitcast_convert_type(y, jnp.int32),
                      (y * 2).astype(jnp.int32)])


def med(fn, reps=6):
    fn(0)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(i + 1)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


print("two fresh (Q,k) readbacks:",
      round(med(lambda s: (np.asarray(two(base, s)[0]),
                           np.asarray(two(base, s)[1]))), 1),
      "ms", flush=True)


def one_call(s):
    b = np.asarray(one(base, s))
    return b[0].view(np.float32), b[1]


print("one fresh (2,Q,k) readback:", round(med(one_call), 1), "ms",
      flush=True)


def two_samecall(s):
    a, b = two(base, s)
    return np.asarray(a), np.asarray(b)


print("two fresh (same call) readbacks:", round(med(two_samecall), 1),
      "ms", flush=True)
print("READ PROBE OK", flush=True)
