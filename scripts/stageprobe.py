"""Per-stage device rates with FORCED scalar syncs (block_until_ready
does not reliably block through the axon tunnel; identical-input
redispatch can be memoized — use fresh data + dependent scalar pulls).
Usage: python scripts/stageprobe.py"""
import time, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from bzip3_tpu.ops.device.bwt import bwt_forward_batch, bwt_inverse_batch
from bzip3_tpu.ops.device.cm_pallas import cm_encode_pallas_batch, cm_decode_pallas_batch
from bzip3_tpu.ops.device import crc32_batch_auto
from bzip3_tpu.pipeline import encode_core, decode_core
from bench import make_corpus

K, N = 32, 1 << 20

def sync(*arrs):
    return float(sum(jnp.sum(a.astype(jnp.int32)) for a in arrs))

def fresh(seed):
    corpus = make_corpus(int(K * N * 1.08) + (1 << 20), seed=seed)[: K * N]
    rows = np.frombuffer(corpus, np.uint8).reshape(K, N)
    return rows, jnp.asarray(rows), jnp.full((K,), N, jnp.int32)

rows, data, lens = fresh(0)
t0 = time.time(); crc = crc32_batch_auto(data, lens); sync(crc)
print(f'crc compile+run {time.time()-t0:.1f}s', flush=True)
t0 = time.time(); u, idx = bwt_forward_batch(data, lens); sync(u, idx)
print(f'fwd compile+run {time.time()-t0:.1f}s', flush=True)
t0 = time.time(); pay, plens = cm_encode_pallas_batch(u, lens); sync(pay, plens)
print(f'cme compile+run {time.time()-t0:.1f}s', flush=True)
t0 = time.time(); dec = cm_decode_pallas_batch(pay.astype(jnp.uint8), plens, lens, N); sync(dec)
print(f'cmd compile+run {time.time()-t0:.1f}s', flush=True)
t0 = time.time(); inv = bwt_inverse_batch(u, lens, idx); sync(inv)
print(f'inv compile+run {time.time()-t0:.1f}s', flush=True)
assert np.array_equal(np.asarray(inv), rows)

mb = K * N / (1 << 20)
for rep in range(2):
    rows, data, lens = fresh(rep + 1)
    sync(data)
    t0 = time.time(); crc = crc32_batch_auto(data, lens); sync(crc); t_c = time.time() - t0
    t0 = time.time(); u, idx = bwt_forward_batch(data, lens); sync(u, idx); t_f = time.time() - t0
    t0 = time.time(); pay, plens = cm_encode_pallas_batch(u, lens); sync(pay, plens); t_ce = time.time() - t0
    t0 = time.time(); dec = cm_decode_pallas_batch(pay.astype(jnp.uint8), plens, lens, N); sync(dec); t_cd = time.time() - t0
    t0 = time.time(); inv = bwt_inverse_batch(u, lens, idx); sync(inv); t_i = time.time() - t0
    print(f'rep{rep}: crc {t_c:.2f}s  fwd {t_f:.2f}s ({mb/t_f:.2f})  cme {t_ce:.2f}s ({mb/t_ce:.2f})  '
          f'cmd {t_cd:.2f}s ({mb/t_cd:.2f})  inv {t_i:.2f}s ({mb/t_i:.2f})', flush=True)

# fused cores (what the pipeline actually dispatches)
rows, data, lens = fresh(9)
outs = encode_core(data, lens, data, lens); sync(outs[2])
for rep in range(2):
    rows, data, lens = fresh(10 + rep)
    sync(data)
    t0 = time.time()
    crc2, idx2, pay2, plens2, ok2 = encode_core(data, lens, data, lens)
    sync(crc2, idx2, pay2, plens2)
    t_enc = time.time() - t0
    print(f'fused encode_core: {t_enc:.2f}s ({mb/t_enc:.2f} MB/s)', flush=True)
pw = 1 << 20
payw = jnp.zeros((K, pw), jnp.uint8).at[:, : pay2.shape[1]].set(pay2.astype(jnp.uint8))
d = decode_core(payw, plens2, lens, idx2, N); sync(d)
for rep in range(2):
    t0 = time.time()
    d = decode_core(payw, plens2, lens, idx2, N); sync(d)
    print(f'fused decode_core: {time.time()-t0:.2f}s', flush=True)
    payw = payw + 0  # new buffer identity to defeat memoization
    sync(payw)
