import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("FMX_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two-tier suite (r13 verdict #2): the external driver's verify window
# expired mid-run once the full suite passed ~47 min, so the DEFAULT
# tier must finish inside that window (<10 min): unit tests, planlint,
# the byte-exact sentinels, and an oracle SPOT SET (headliners +
# known-risk families + a deterministic hash sample of the registry).
# FMX_FULL_SUITE=1 restores the full 461-entry oracle sweep and the
# partition-invariance nets; the builder runs that tier before every
# round close (logged in OPTIMIZATION_r14.md).
FULL_SUITE = os.environ.get("FMX_FULL_SUITE") == "1"


def registry_selection():
    """Query names the DEFAULT tier sweeps: every bench headliner,
    every byte-exact sentinel, and a deterministic sha1(name) %% 4
    sample of the rest (~30%, spans every family, stable across
    runs).  Under FMX_FULL_SUITE=1 this is the whole registry.  One
    definition so the oracle harness, the registry-wide plan sweeps,
    and the vanilla-session replay select identically."""
    import hashlib

    import fmx.queries as Q

    ALL = Q.all_queries()
    if FULL_SUITE:
        return sorted(ALL)
    from tests.test_byte_exact_sentinels import SENTINELS

    names = {n for n, s in ALL.items() if s.headline}
    names |= set(SENTINELS)
    names |= {n for n in ALL
              if int(hashlib.sha1(n.encode()).hexdigest(), 16) % 4 == 0}
    return sorted(names)


@pytest.fixture(scope="session")
def spark():
    from fmx.session import get_spark

    s = get_spark(app_name="fmx-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
