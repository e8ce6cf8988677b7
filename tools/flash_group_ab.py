"""A/B the head-grouped flash kernel vs per-head grid vs XLA at serving
shapes (VERDICT r3 item 5: the Pallas kernel lost at S=320/512, exactly the
prompt-64 + gen-256 headline shape).

Times rope+attention both ways like bench_sweep.bench_attention_crossover
(fori_loop-chained, scalar output, forced D2H).  8B head geometry.

Usage: python tools/flash_group_ab.py [--seqs 320,512,1024] [--groups 1,8,16,32]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_loop(fn, args, iters=16, reps=3):
    @jax.jit
    def run(args):
        def body(_, c):
            out = fn(*c)
            return (out.astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, iters, body, args)[0].sum() \
            .astype(jnp.float32)

    np.asarray(run(args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(run(args))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / iters


def main():
    from ct_diffusionmodelbench_tpu.models.layers import rope_angles
    from ct_diffusionmodelbench_tpu.ops.attention import attention

    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="320,512,1024")
    ap.add_argument("--groups", default="1,8,16,32")
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--direct", action="store_true",
                    help="also A/B the shared-scratch direct kernel "
                         "(CTDB_FLASH_DIRECT=1)")
    args = ap.parse_args()

    h, kv, dh, b = args.heads, args.kv, 128, args.batch
    for S in (int(x) for x in args.seqs.split(",")):
        q, k, v = (jax.random.normal(jax.random.key(i), (b, S, h, dh),
                                     jnp.bfloat16) for i in range(3))
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (b, S))
        cos, sin = rope_angles(pos, dh, 500000.0)
        iters = max(4, 2048 // max(S // 512, 1))
        t_ref = time_loop(
            lambda q_, k_, v_: attention(q_, k_, v_, impl="reference",
                                         rope=(cos, sin)),
            (q, k, v), iters=iters)
        print(f"S={S:5d} b={b} xla_ref {t_ref*1e3:7.3f} ms")
        for g in (int(x) for x in args.groups.split(",")):
            if h % g or not (g % (h // kv) == 0 or (h // kv) % g == 0):
                continue
            os.environ["CTDB_FLASH_HEAD_GROUP"] = str(g)
            try:
                t = time_loop(
                    lambda q_, k_, v_: attention(q_, k_, v_, impl="pallas",
                                                 rope=(cos, sin)),
                    (q, k, v), iters=iters)
                print(f"          g={g:3d} pallas {t*1e3:7.3f} ms  "
                      f"speedup {t_ref/t:5.2f}x")
            except Exception as e:
                print(f"          g={g:3d} FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}")
            finally:
                os.environ.pop("CTDB_FLASH_HEAD_GROUP", None)
        if args.direct:
            # Shared-scratch direct kernel (VERDICT r4 item 6): auto head
            # group (usually g=h → ONE program at B=1), plus the same
            # explicit-g ladder for attribution.
            for g in [0] + [int(x) for x in args.groups.split(",")]:
                if g and (h % g or not (g % (h // kv) == 0
                                        or (h // kv) % g == 0)):
                    continue
                os.environ["CTDB_FLASH_DIRECT"] = "1"
                if g:
                    os.environ["CTDB_FLASH_HEAD_GROUP"] = str(g)
                try:
                    t = time_loop(
                        lambda q_, k_, v_: attention(
                            q_, k_, v_, impl="pallas", rope=(cos, sin)),
                        (q, k, v), iters=iters)
                    gl = f"g={g:3d}" if g else "g=auto"
                    print(f"          direct {gl} {t*1e3:7.3f} ms  "
                          f"speedup {t_ref/t:5.2f}x")
                except Exception as e:
                    print(f"          direct g={g} FAILED "
                          f"{type(e).__name__}: {str(e)[:100]}")
                finally:
                    os.environ.pop("CTDB_FLASH_DIRECT", None)
                    os.environ.pop("CTDB_FLASH_HEAD_GROUP", None)


if __name__ == "__main__":
    main()
