"""Direct bin-membership probe for the TPU PartialReduce behind
jax.lax.approx_max_k(aggregate_to_topk=False).

For a one-hot input (x[i]=1, everything else -1), the hot element wins its
bin, so argmax over slots = bin(i). Map bin(i) for i in [0, 8192) plus
strided samples to infer the periodic structure.
"""

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def bin_of(positions, n, kc=32, rt=0.95):
    """positions: int array. Returns (bin ids, m)."""
    out = []
    m = None

    @jax.jit
    def run(hot):
        iota = jnp.arange(n, dtype=jnp.int32)[None, :]
        x = jnp.where(iota == hot[:, None], 1.0, -1.0).astype(jnp.float32)
        v, i = jax.lax.approx_max_k(x, kc, recall_target=rt,
                                    aggregate_to_topk=False)
        return jnp.argmax(v, axis=1), v.shape[1]

    for s in range(0, len(positions), 256):
        chunk = positions[s:s + 256]
        pad = 256 - len(chunk)
        hot = jnp.asarray(np.concatenate([chunk, np.zeros(pad, np.int64)]),
                          jnp.int32)
        b, m = run(hot)
        out.append(np.asarray(b)[:len(chunk)])
    return np.concatenate(out), m


def main():
    n = 262144
    pos = np.arange(8192)
    bins, m = bin_of(pos, n)
    print(f"m={m}", flush=True)
    # hypothesis search: bin(i) as function of (lane=i%128, sub=(i//128)%8,
    # tile=i//1024)
    lane = pos % 128
    sub = (pos // 128) % 8
    tile = pos // 1024
    # print mapping for the first 3 tiles, lanes 0..3
    for t in range(3):
        for s8 in range(8):
            sel = (tile == t) & (sub == s8) & (lane < 4)
            print(f"tile={t} sub={s8}: lanes0-3 -> bins "
                  f"{bins[sel].tolist()}", flush=True)
    # candidate formulas
    cands = {
        "lane + 128*sub": lane + 128 * sub,
        "lane + 128*(sub%4)": lane + 128 * (sub % 4),
        "lane + 128*(sub//2)": lane + 128 * (sub // 2),
        "lane + 128*(sub%2)*4 + 128*(sub//2)": lane + 512 * (sub % 2) + 128 * (sub // 2),
        "lane + 128*((sub + tile*8) % (m//128))": lane + 128 * ((sub + tile * 8) % (m // 128)),
    }
    for name, f in cands.items():
        print(f"  {name}: match={np.mean(f == bins):.4f}", flush=True)
    # periodicity over i
    for period in (1024, 2048, 4096, 8192):
        ok = np.mean(bins[:period] == bins[period:2 * period]) if 2 * period <= len(pos) else -1
        print(f"  period {period}: {ok:.4f}", flush=True)
    # long-range: does bin(i) == bin(i % P) for big i?
    far = np.arange(0, n, 1024) + 7  # lane 7, sub 0 of each tile
    fb, _ = bin_of(far, n)
    print(f"far samples (i=1024t+7): unique bins {np.unique(fb).tolist()[:20]}",
          flush=True)
    far2 = np.arange(0, n, 8192) + 4096 + 3  # deeper offset
    fb2, _ = bin_of(far2, n)
    print(f"far2 (i=8192t+4099): unique bins {np.unique(fb2).tolist()[:20]}",
          flush=True)
    # dump raw mapping structure: bins for i in 0..32 and 1024..1056
    print("bins[0:32]   =", bins[0:32].tolist(), flush=True)
    print("bins[128:160]=", bins[128:160].tolist(), flush=True)
    print("bins[1024:1056]=", bins[1024:1056].tolist(), flush=True)
    print("bins[4096:4128]=", bins[4096:4128].tolist(), flush=True)
    np.save("/tmp/certx_bins.npy", bins)


if __name__ == "__main__":
    main()
