import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, numpy as np, jax
from simhand_tpu.mining import mine_similar_hands

rng = np.random.default_rng(0)
N = 100_000
kp = rng.uniform(0, 1, size=(N, 21, 2)).astype(np.float32)
vids = rng.integers(0, 5000, size=N).astype(np.int32)

t0 = time.perf_counter()
d, i = mine_similar_hands(kp, vids, k=1, query_chunk=8192, db_chunk=8192)
dt_cold = time.perf_counter() - t0
t0 = time.perf_counter()
d, i = mine_similar_hands(kp, vids, k=1, query_chunk=8192, db_chunk=8192)
dt = time.perf_counter() - t0
print(f"mined {N} hands (k=1): cold {dt_cold:.1f}s, warm {dt:.1f}s -> {N/dt:.0f} hands/s", flush=True)
# projection to the 2M corpus: O(N^2) pair work
proj = dt * (2_000_000 / N) ** 2
print(f"projected 2.0M-corpus mining time on this chip: {proj/60:.1f} min", flush=True)
assert (i >= 0).all() and np.isfinite(d).all()
print("results valid", flush=True)
