"""Headline benchmark: batched fused lnpost evals/sec/chip.

Reference baseline (BASELINE.md): BasicStarModel binary-star ``lnpost`` takes
719 us/eval single-core (docs/multiple.ipynb cell 9) ~= 1391 evals/s. The
north star is >=1e6 evals/sec/chip. This benchmark times the same computation
— the fused binary-star posterior (two chained grid interpolations per
component, BC composition, flux-sum, Gaussian lnlike over spectroscopy +
photometry + parallax, full prior stack incl. the EEP change-of-variables
prior) — vmapped over a large walker batch on MIST-scale grids
(15 feh x 196 mass x 1710 eep model grid; 53x15x11x13 BC grid).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_EVALS_PER_SEC = 1.0 / 719e-6  # reference binary lnpost, 1 CPU core


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.default_backend()
    # f32 grids on TPU (f64 is emulated/slow there); f64 elsewhere for parity.
    dtype = np.float32 if platform == "tpu" else np.float64

    from isochrones_tpu import get_ichrone
    from isochrones_tpu.starmodel import BinaryStarModel

    # MIST-scale grids (SURVEY §6: 15 feh x ~196 mass x 1710 eep)
    iso = get_ichrone(
        "synthetic", n_feh=15, n_mass=196, n_eep=1710, n_age=107, dtype=dtype
    )

    eep, age, feh, distance, AV = 350.0, 9.0, 0.0, 200.0, 0.1
    Teff, logg, _, mags = iso.interp_mag([eep, age, feh, distance, AV], ["J", "H", "K", "G"])
    model = BinaryStarModel(
        iso,
        Teff=(Teff, 100.0),
        logg=(logg, 0.1),
        J=(float(mags[0]), 0.02),
        H=(float(mags[1]), 0.02),
        K=(float(mags[2]), 0.02),
        G=(float(mags[3]), 0.01),
        parallax=(5.0, 0.05),
    )

    batch = 1 << 17 if platform == "tpu" else 1 << 14
    rng = np.random.default_rng(0)
    pars = np.stack(
        [
            rng.uniform(200, 450, batch),
            rng.uniform(200, 450, batch),
            rng.uniform(8.5, 9.5, batch),
            rng.uniform(-0.5, 0.3, batch),
            rng.uniform(100, 300, batch),
            rng.uniform(0.0, 0.5, batch),
        ],
        axis=-1,
    ).astype(dtype)
    pars = jnp.asarray(pars)

    fn = model.lnpost_batch
    # warmup / compile
    fn(pars).block_until_ready()

    n_rep = 20 if platform == "tpu" else 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(pars)
    out.block_until_ready()
    t1 = time.perf_counter()

    evals_per_sec = batch * n_rep / (t1 - t0)
    result = {
        "metric": f"binary-star fused lnpost throughput ({platform}, batch {batch}, MIST-scale grids)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
