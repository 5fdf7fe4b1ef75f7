"""Driver-contract tests: dryrun_multichip on the virtual CPU mesh."""

import jax
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier: run with the full suite, excluded by -m 'not slow'


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_multichip_2_falls_back_to_dp():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_dryrun_too_many_devices_clear_error():
    import __graft_entry__ as g

    with pytest.raises(AssertionError, match="need"):
        g.dryrun_multichip(jax.device_count() + 1)
