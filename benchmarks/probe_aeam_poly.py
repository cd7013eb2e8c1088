"""AEAM poly pair-term dispatch: select-chain vs restructures, in isolation.

The poly fast mode evaluates piecewise-Chebyshev refits per edge
([N, K] = [32000, 112] at the bench scene).  _poly_chain builds every
coefficient plane with a flat select chain over ncode = ntab*NSEG = 32
codes: 3 calls x 13 coefficients x 31 selects = ~1200 full-plane selects
per step (~17 ms at 255 G select/s).  Variants:

  P0  current production form (3x _poly_chain + Horner)
  P1  bilinear-over-tables per segment + select-over-segments per
      coefficient (24 FMA + 7 sel per coeff vs 31 sel)
  P2  one [N*K]-row gather from the [32, 64]-padded fused coefficient
      table (f13 | phi13 | frev13, seg-major) + Horner
  P3  Horner per segment (table dim bilinear), select the 5 RESULT
      planes over segments (8x Horner work, 5x7 selects total)

MEASURED (v5e, [32000, 112] f32):
  P0 3.32 ms | P1 9.61 | P2 13.12 | P3 5.58
The production select-chain WINS: XLA fuses constant-operand select
chains far better than the standalone-select roofline suggests (the
chain is compare-against-iota + masked constant folds, not 31 generic
selects).  Poly dispatch is ~3.3 ms of the step — not the AEAM
bottleneck; the bottleneck is retrace churn + rebuild amortization.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(seconds):
    time.sleep(seconds)
    print("# watchdog: clean exit", flush=True)
    os._exit(0)


ITERS = 20


def timeit(name, fn, args, reps=3):
    import jax
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / ITERS:8.2f} ms/iter", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    from lammps_plugins_tpu.potentials.aeam import AEAM
    from lammps_plugins_tpu.potentials.polyfit import U0, NSEG, DEG

    os.environ["LPT_AEAM_POLY"] = "1"
    pair = AEAM.from_file("/root/reference/USER-AEAM/AlSi.aeam",
                          ["Al", "Si"], dtype=jnp.float32)
    nel = 2
    fco = np.asarray(pair.poly.f_coef, np.float64)      # [4, NSEG, 13]
    pco = np.asarray(pair.poly.phi_coef, np.float64)

    N, K = 32000, 112
    rng = np.random.default_rng(0)
    ei_np = (rng.random(N) < 0.0075).astype(np.int32)
    ej_np = (rng.random((N, K)) < 0.0075).astype(np.int32)
    r_np = rng.uniform(2.2, 6.4, (N, K)).astype(np.float32)
    cut_np = np.asarray(pair.tables.cut, np.float32)[ei_np[:, None], ej_np]

    ei = jax.device_put(jnp.asarray(ei_np)[:, None])
    ej = jax.device_put(jnp.asarray(ej_np))
    r = jax.device_put(jnp.asarray(r_np))
    cut_ij = jax.device_put(jnp.asarray(cut_np))

    def seg_of(r_, cut_):
        u = r_ / cut_
        t = (u - U0) * (NSEG / (1.0 - U0))
        t = jnp.clip(t, 0.0, NSEG * (1.0 - 1e-6))
        seg = jnp.floor(t).astype(jnp.int32)
        v = 2.0 * (t - seg) - 1.0
        dv_dr = (2.0 * NSEG / (1.0 - U0)) / cut_
        return seg, v, dv_dr

    # ---- P0: production form ------------------------------------------
    def p0(r_, cut_, ei_, ej_):
        out = pair._poly_pair_terms(ei_, ej_, r_, cut_)
        acc = out[0]
        for o in out[1:]:
            acc = acc + o
        return acc

    def loop(fn):
        def run(r_, cut_, ei_, ej_):
            def body(c, _):
                c = c + fn(r_ + 1e-7 * c[0, 0], cut_, ei_, ej_)
                return c, None
            c, _ = jax.lax.scan(body, jnp.zeros_like(r_), None, length=ITERS)
            return c
        return jax.jit(run)

    # ---- P1: bilinear tables + segment selects -------------------------
    def bil4(tab):                       # tab [4] corner values -> coeffs
        a0 = float(tab[0])
        a1 = float(tab[2] - tab[0])
        b0 = float(tab[1] - tab[0])
        b1 = float(tab[3] - tab[2] - tab[1] + tab[0])
        return a0, a1, b0, b1

    def p1(r_, cut_, ei_, ej_):
        seg, v, dv_dr = seg_of(r_, cut_)
        eif = ei_.astype(r_.dtype)
        ejf = ej_.astype(r_.dtype)
        ejr = eif * 0 + ejf              # broadcast [N, K]

        def coeffs(co, swap):
            # per coefficient: bilinear over tables per segment, then
            # select over segments
            cs = []
            for k in range(DEG + 1):
                acc = None
                for s in range(NSEG):
                    a0, a1, b0, b1 = bil4(co[:, s, k])
                    if swap:
                        val = (a0 + a1 * ejr) + (b0 + b1 * ejr) * eif
                    else:
                        val = (a0 + a1 * eif) + (b0 + b1 * eif) * ejr
                    acc = val if acc is None else \
                        jnp.where(seg == s, val, acc)
                cs.append(acc)
            return cs

        def horner(cs, want_val, want_der):
            val = der = None
            if want_val:
                val = cs[DEG]
                for k in range(DEG - 1, -1, -1):
                    val = val * v + cs[k]
            if want_der:
                der = DEG * cs[DEG]
                for k in range(DEG - 1, 0, -1):
                    der = der * v + k * cs[k]
                der = der * dv_dr
            return val, der

        f_ij, fp_ij = horner(coeffs(fco, False), True, True)
        _, fp_ji = horner(coeffs(fco, True), False, True)
        _, phip = horner(coeffs(pco, False), False, True)
        return f_ij + fp_ij + fp_ji + phip

    # ---- P2: fused row gather ------------------------------------------
    rows = np.zeros((4 * NSEG, 64), np.float32)
    for tab in range(4):
        i_, j_ = tab // nel, tab % nel
        for s in range(NSEG):
            rows[tab * NSEG + s, 0:13] = fco[tab, s]
            rows[tab * NSEG + s, 16:29] = pco[tab, s]
            rows[tab * NSEG + s, 32:45] = fco[j_ * nel + i_, s]
    rows_dev = jax.device_put(jnp.asarray(rows))

    def p2(r_, cut_, ei_, ej_):
        seg, v, dv_dr = seg_of(r_, cut_)
        code = (ei_ * nel + ej_) * NSEG + seg
        c = rows_dev[code.reshape(-1)].reshape(r_.shape + (64,))

        def horner(base, want_val, want_der):
            val = c[..., base + DEG]
            der = DEG * c[..., base + DEG]
            for k in range(DEG - 1, 0, -1):
                val = val * v + c[..., base + k]
                der = der * v + k * c[..., base + k]
            val = val * v + c[..., base]
            return (val if want_val else None,
                    der * dv_dr if want_der else None)

        f_ij, fp_ij = horner(0, True, True)
        _, fp_ji = horner(32, False, True)
        _, phip = horner(16, False, True)
        return f_ij + fp_ij + fp_ji + phip

    # ---- P3: Horner per segment, select results ------------------------
    def p3(r_, cut_, ei_, ej_):
        seg, v, dv_dr = seg_of(r_, cut_)
        eif = ei_.astype(r_.dtype)
        ejf = ej_.astype(r_.dtype)
        ejr = eif * 0 + ejf

        def eval_seg(co, s, swap, want_val):
            # dual Horner: b = p(v), d = p'(v)
            b = d = None
            for k in range(DEG, -1, -1):
                a0, a1, b0, b1 = bil4(co[:, s, k])
                if swap:
                    ck = (a0 + a1 * ejr) + (b0 + b1 * ejr) * eif
                else:
                    ck = (a0 + a1 * eif) + (b0 + b1 * eif) * ejr
                if b is None:
                    b = ck
                    d = jnp.zeros_like(ck)
                else:
                    d = d * v + b
                    b = b * v + ck
            return (b if want_val else None, d)

        def piecewise(co, swap, want_val):
            vacc = dacc = None
            for s in range(NSEG):
                vs, ds = eval_seg(co, s, swap, want_val)
                if vacc is None:
                    vacc, dacc = vs, ds
                else:
                    if want_val:
                        vacc = jnp.where(seg == s, vs, vacc)
                    dacc = jnp.where(seg == s, ds, dacc)
            return vacc, (dacc * dv_dr)

        f_ij, fp_ij = piecewise(fco, False, True)
        _, fp_ji = piecewise(fco, True, False)
        _, phip = piecewise(pco, False, False)
        return f_ij + fp_ij + fp_ji + phip

    timeit("P0 production select-chain ", loop(p0), (r, cut_ij, ei, ej))
    timeit("P1 bilinear+seg-select     ", loop(p1), (r, cut_ij, ei, ej))
    timeit("P2 fused [32,64] row gather", loop(p2), (r, cut_ij, ei, ej))
    timeit("P3 horner/seg, result sel  ", loop(p3), (r, cut_ij, ei, ej))
    print("# done", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
