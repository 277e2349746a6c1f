"""Two-process multi-host rehearsal (scripts/rehearse_multihost.py) as an
opt-in test: REAL jax.distributed processes over a localhost coordinator,
exercising per-process loader sharding, make_array_from_process_local_data
batch assembly, and the collective Orbax checkpoint save.

Opt-in (HVC_RUN_MULTIHOST=1) because the rehearsal spawns two fresh Python
processes that can't share the session's jax runtime (and takes ~3-7 min on
a loaded host); the default suite stays single-process. The driver-facing
rehearsal result is recorded in docs/ROUND_NOTES.md wave 11.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(os.environ.get("HVC_RUN_MULTIHOST") != "1",
                    reason="set HVC_RUN_MULTIHOST=1 to run the 2-process rehearsal")
def test_two_process_rehearsal():
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "rehearse_multihost.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert '"multihost_rehearsal": "OK"' in res.stdout, res.stdout[-2000:]
