"""Multi-host path: N real OS processes over one global mesh.

Launches scripts/dryrun_multihost.py, which spawns 2 child processes with
4 virtual CPU devices each; the children join one JAX distributed runtime
and run ALL THREE shipped training modes — jitted DP train steps over the
global ('data',) mesh, molecule-aligned edge-sharded PackedLGGNN train
steps over the global ('edge',) mesh, and the composed HYBRID
(data=2, edge=4) mesh where the 'data' axis spans the process boundary —
with the collectives crossing the process boundary the way they would
cross DCN on a real multi-host slice. The parent asserts both processes
compute identical finite losses in each phase (replicated state stays in
sync); each child additionally asserts the hybrid loss equals a
single-device control run of the same data.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dp_edge_sharded_and_hybrid_training():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multihost.py"),
         "--processes", "2", "--steps", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multihost ok: 2 processes" in proc.stdout, proc.stdout
    assert "edge_sharded_loss=" in proc.stdout, proc.stdout
    assert "hybrid_dpxedge_loss=" in proc.stdout, proc.stdout
