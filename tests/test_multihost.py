"""Unit tests for `mrijax.parallel.multihost` (VERDICT r1 item 9).

The helpers replace the reference's residual host-scalar collectives
(`ddpm_3d_ldm/train.py:127-132,509-512`). Single-process behavior runs for
real; the multi-process branches are exercised by monkeypatching
``jax.process_count`` and the ``multihost_utils`` collectives — the goal is
to pin the *consensus semantics* (host-0 wins; agree=ALL; flagged=ANY),
which is where a rewrite could silently regress.
"""

import numpy as np
import pytest

import jax
from jax.experimental import multihost_utils

from mrijax.parallel import multihost


def test_initialize_single_process_is_noop():
    # No coordinator configured: must not raise, and process_count stays 1.
    multihost.initialize()
    assert jax.process_count() == 1


def test_single_process_passthrough():
    assert multihost.broadcast_from_host0(3.25) == 3.25
    assert multihost.all_processes_agree(True) is True
    assert multihost.all_processes_agree(False) is False
    assert multihost.any_process_flagged(True) is True
    assert multihost.any_process_flagged(False) is False


@pytest.fixture
def fake_4_processes(monkeypatch):
    """Pretend to be one of 4 hosts; capture what each helper sends and
    script what the collective returns."""
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    sent = {}

    def fake_broadcast(x):
        sent["broadcast"] = np.asarray(x)
        # host-0's value comes back on every host, regardless of ours —
        # in the scalar helper's wire format (float64 bits as uint32 pair,
        # immune to jax's silent float64→float32 downcast when x64 is off)
        return np.asarray(7.5, np.float64).reshape(1).view(np.uint32)

    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", fake_broadcast)
    return sent


def test_broadcast_returns_host0_value(fake_4_processes):
    out = multihost.broadcast_from_host0(123.0)
    assert out == 7.5  # our local 123.0 is discarded; host-0's scalar wins
    sent = fake_4_processes["broadcast"]
    assert sent.dtype == np.uint32 and sent.shape == (2,)
    # the wire bits decode to OUR value at full float64 precision: a
    # sub-float32-epsilon distinction must survive the round trip
    assert float(sent.view(np.float64)[0]) == 123.0
    probe = 1.0 + 2.0**-40
    multihost.broadcast_from_host0(probe)
    assert float(
        fake_4_processes["broadcast"].view(np.float64)[0]) == probe


@pytest.mark.parametrize(
    "votes, agree, flagged",
    [
        ([True, True, True, True], True, True),
        ([True, False, True, True], False, True),  # one dissent kills agree
        ([False, False, False, False], False, False),
        ([False, False, True, False], False, True),  # one flag suffices
    ],
)
def test_consensus_semantics(monkeypatch, votes, agree, flagged):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(
        multihost_utils,
        "process_allgather",
        lambda x: np.asarray(votes).reshape(4, 1),
    )
    # all_processes_agree = AND over hosts (early-stop must be unanimous)
    assert multihost.all_processes_agree(votes[0]) is agree
    # any_process_flagged = OR over hosts (SIGUSR1 on one host stops all)
    assert multihost.any_process_flagged(votes[0]) is flagged


def test_initialize_raises_when_multiprocess_requested_but_fails(monkeypatch):
    def boom(**kw):
        raise RuntimeError("no coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError):
        multihost.initialize(coordinator_address="10.0.0.1:1234",
                            num_processes=4, process_id=1)
    # ANY explicit rendezvous arg makes a failed init loud — silently
    # degrading to single-process would have every host train the full
    # dataset and clobber the shared run dir (round-4 review finding)
    with pytest.raises(RuntimeError):
        multihost.initialize(coordinator_address="10.0.0.1:1234")
    with pytest.raises(RuntimeError):
        multihost.initialize(process_id=1)
    # but an explicit single-process request swallows the failure
    multihost.initialize(num_processes=1)
    # required=True (caller detected MRIJAX_MULTIHOST / SLURM_NTASKS>1)
    # makes the failure loud even with all-None rendezvous args — the
    # env-discovered path must never silently degrade to single-process
    # (round-5 advisor finding: cli.cmd_train passes required=is_multihost)
    with pytest.raises(RuntimeError):
        multihost.initialize(required=True)
    # and an auto-discovery miss with nothing requested stays quiet
    multihost.initialize()


def test_cli_multihost_mode_predicate(monkeypatch):
    """The ONE predicate gating rendezvous AND rank-0 writes (cli.py
    _multihost_mode): rendezvous flags, MRIJAX_MULTIHOST, and multi-task
    SLURM allocations trigger it; a lone --process-id is no longer
    silently dropped (round-4 review finding)."""
    import argparse

    from mrijax.cli import _multihost_mode

    def ns(**kw):
        base = dict(coordinator=None, num_processes=None, process_id=None)
        base.update(kw)
        return argparse.Namespace(**base)

    monkeypatch.delenv("MRIJAX_MULTIHOST", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert _multihost_mode(ns()) is False
    assert _multihost_mode(ns(coordinator="h:1")) is True
    assert _multihost_mode(ns(num_processes=2)) is True
    assert _multihost_mode(ns(process_id=0)) is True  # rank 0 still counts
    # --num-processes 1 alone is a plain single-process run: launchers
    # template it from $NTASKS; required=True would otherwise turn
    # initialize()'s num_processes=1 degrade contract into a crash
    assert _multihost_mode(ns(num_processes=1)) is False
    monkeypatch.setenv("MRIJAX_MULTIHOST", "1")
    assert _multihost_mode(ns()) is True
    monkeypatch.delenv("MRIJAX_MULTIHOST")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert _multihost_mode(ns()) is True
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert _multihost_mode(ns()) is False
    monkeypatch.setenv("SLURM_NTASKS", "not-a-number")
    assert _multihost_mode(ns()) is False
