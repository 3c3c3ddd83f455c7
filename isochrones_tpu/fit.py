"""Convergence-driven MCMC harness with checkpoint/resume.

Rebuild of ``isochrones/fit.py:9-170`` (the emcee3 harness: HDF backend
resume, autocorrelation-based convergence loop targeting ``targetn``
effective samples, burn-in discard, thinned sample save). The sampler here
is the on-device affine-invariant ensemble (:mod:`samplers.ensemble`): each
``iter_chunksize`` chunk is one ``lax.scan`` on device; only the
convergence diagnostics and checkpointing run on host between chunks.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .logger import getLogger
from .samplers.ensemble import autocorr_time, run_ensemble

__all__ = [
    "fit_mcmc_convergent",
    "fit_emcee3",
    "write_samples",
    "McmcBackend",
    "Emcee3Model",
    "Emcee3PriorModel",
]


class Emcee3Model:
    """Reference-compat wrapper splitting a star model's posterior into
    prior and likelihood callables (reference fit.py:9-20; the emcee3
    Model/state protocol collapses to plain functions here — the on-device
    sampler consumes batched lnpost directly)."""

    def __init__(self, mod):
        self.mod = mod

    def compute_log_prior(self, coords):
        return self.mod.lnprior(coords)

    def compute_log_likelihood(self, coords):
        return self.mod.lnlike(coords)

    def __call__(self, coords):
        return self.compute_log_prior(coords) + self.compute_log_likelihood(coords)


class Emcee3PriorModel(Emcee3Model):
    """Prior-only variant (reference fit.py:23-34)."""

    def compute_log_likelihood(self, coords):
        return 0.0


class McmcBackend:
    """HDF5 chain checkpoint (the emcee3 HDFBackend role, fit.py:79-86)."""

    def __init__(self, filename=None):
        self.filename = filename

    def load(self):
        """Returns (chain (n_iter, n_walkers, n_params), ln (n_iter, n_walkers))
        or None."""
        if self.filename is None or not os.path.exists(self.filename):
            return None
        import h5py

        with h5py.File(self.filename, "r") as f:
            if "chain" not in f:
                return None
            return np.asarray(f["chain"]), np.asarray(f["ln_prob"])

    def save(self, chain, ln_prob, columns):
        if self.filename is None:
            return
        import h5py

        os.makedirs(os.path.dirname(os.path.abspath(self.filename)), exist_ok=True)
        with h5py.File(self.filename, "w") as f:
            f.create_dataset("chain", data=chain)
            f.create_dataset("ln_prob", data=ln_prob)
            f.attrs["columns"] = json.dumps(list(columns))

    def reset(self):
        if self.filename is not None and os.path.exists(self.filename):
            os.remove(self.filename)


def write_samples(mod, df, resultsdir="mcmc_results"):
    """reference fit.py:37-44 (csv instead of pytables HDF)."""
    os.makedirs(resultsdir, exist_ok=True)
    samplefile = os.path.join(resultsdir, f"{mod.name}.csv")
    df.to_csv(samplefile, index=False)
    return samplefile


def fit_mcmc_convergent(
    mod,
    nwalkers=500,
    verbose=False,
    nsamples=5000,
    targetn=4,
    iter_chunksize=200,
    overwrite=False,
    maxiter=10,
    sample_directory="mcmc_chains",
    nburn=2,
    resultsdir="mcmc_results",
    prior_only=False,
    seed=None,
    moves="mixed",
    **kwargs,
):
    """Run the ensemble sampler in chunks until ``targetn`` effective
    samples (reference fit_emcee3, fit.py:47-170).

    nburn : number of autocorrelation times to discard as burn-in.
    moves : proposal mixture; defaults to "mixed" (KDE/DE/snooker
        0.4/0.4/0.2, the reference harness's mixedmoves=True mixture,
        fit.py:110-120; small ensembles auto-fall back to DE/snooker).
    """
    import jax
    import jax.numpy as jnp
    import pandas as pd

    logger = getLogger()
    backend = McmcBackend(
        os.path.join(sample_directory, f"{mod.name}.h5") if sample_directory is not None else None
    )
    if overwrite:
        backend.reset()

    if prior_only:
        lnpost = mod.lnprior_batch
    else:
        lnpost = mod.lnpost_batch

    prev = backend.load()
    chains = []
    lns = []
    if prev is not None:
        chain0, ln0 = prev
        if chain0.shape[1] == nwalkers:
            chains.append(chain0)
            lns.append(ln0)
            coords = jnp.asarray(chain0[-1])
        else:
            coords = jnp.asarray(mod.sample_from_prior(nwalkers, require_valid=True, values=True))
    else:
        coords = jnp.asarray(mod.sample_from_prior(nwalkers, require_valid=True, values=True))

    key = jax.random.PRNGKey(seed if seed is not None else 0)

    def calc_stats():
        full = np.concatenate(chains, axis=0)
        tau = autocorr_time(full)
        tau_max = float(np.nanmax(tau))
        niter = full.shape[0]
        neff = niter / max(tau_max, 1e-9) - nburn
        if verbose:
            logger.info("Maximum autocorrelation time: %s", tau_max)
            logger.info("N_eff: %s (%s)", neff * nwalkers, neff)
        return tau_max, neff

    done = False
    tau_max = 0.0
    if chains and not overwrite:
        tau_max, neff = calc_stats()
        done = neff > targetn

    for iteration in range(maxiter):
        if done:
            break
        if verbose:
            logger.info("Iteration %d...", iteration + 1)
        key, k_run = jax.random.split(key)
        chunk, ln_chunk, state = run_ensemble(lnpost, coords, k_run, n_steps=iter_chunksize, moves=moves)
        coords = state.walkers
        chains.append(np.asarray(chunk))
        lns.append(np.asarray(ln_chunk))
        backend.save(np.concatenate(chains, axis=0), np.concatenate(lns, axis=0), mod.param_names)
        tau_max, neff = calc_stats()
        if neff > targetn:
            done = True

    full = np.concatenate(chains, axis=0)
    full_ln = np.concatenate(lns, axis=0)
    if not done:
        logger.warning(
            "fit_mcmc_convergent: not converged after maxiter=%d chunks "
            "(tau_max=%.0f, need neff > %s); samples may be unreliable.",
            maxiter, tau_max, targetn,
        )
    # never burn the whole chain: a non-converged tau_max can exceed the
    # chain length, which would silently return an empty DataFrame
    burnin = min(int(nburn * tau_max), full.shape[0] // 2)
    samples = full[burnin:].reshape(-1, full.shape[-1])
    ln_flat = full_ln[burnin:].reshape(-1)
    ntot = min(nsamples, len(samples))
    if verbose:
        logger.info("Discarding %d steps for burn-in", burnin)
        logger.info("Randomly choosing %d samples", ntot)
    rng = np.random.default_rng(seed)
    inds = rng.choice(len(samples), size=ntot, replace=False)

    df = pd.DataFrame(samples[inds], columns=list(mod.param_names))
    df["lnprob"] = ln_flat[inds]
    write_samples(mod, df, resultsdir=resultsdir)
    mod._samples = df
    mod._derived_samples = None
    return df


def fit_emcee3(mod, mixedmoves=True, pool=None, **kwargs):
    """Reference-named alias for :func:`fit_mcmc_convergent` (reference
    fit.py:47-170). ``mixedmoves`` maps onto the ``moves`` mixture;
    ``pool`` is accepted and ignored (parallelism is on-device batching,
    not process pools)."""
    kwargs.setdefault("moves", "mixed" if mixedmoves else "stretch")
    return fit_mcmc_convergent(mod, **kwargs)
