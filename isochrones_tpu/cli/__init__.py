"""Command-line entry points (L6).

Rebuilds of the reference's ``scripts/`` tier: ``starfit``
(scripts/starfit:34-106), ``starfit-summarize`` (scripts/starfit-summarize),
``starmodel-select`` (scripts/starmodel-select), ``mist-initialize.py``,
``clusterfit.py``, ``batch_starfit``, and ``generate_cmd.py`` — wired to the
on-device fitting stack instead of external samplers.
"""
