"""Driver-contract smoke tests: entry() traces; dryrun config is consistent."""

import jax
import numpy as np


def test_entry_traces():
    """jax.eval_shape of the flagship forward — catches structural breaks
    without paying the compile."""
    import __graft_entry__ as g

    fn, (params, batch) = g.entry()
    out = jax.eval_shape(fn, params, batch)
    assert out.shape == (1, 4, 256, 256, 3)  # B=1, N=2·n_views, 256²


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_dryrun_multihost():
    """Simulated 2-host bring-up (jax.distributed over 2 subprocesses × 2
    virtual CPU devices): one global dp=4 fine train step, loss parity
    across hosts and with a single-process run (DDP process-group
    semantics, train_lightning.py:68-72)."""
    import __graft_entry__ as g

    g.dryrun_multihost(num_processes=2, n_local=2)
