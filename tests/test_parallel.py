"""Multi-chip sharded recon step: the tile-column-sharded result must
equal the unsharded computation (ppermute halos + psum'd counts).

Runs in a subprocess with a scrubbed environment: the axon PJRT plugin
registers at interpreter start via sitecustomize, so an in-process
JAX_PLATFORMS=cpu cannot create the virtual 8-device mesh."""
import os
import subprocess
import sys


def test_sharded_recon_matches_unsharded():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    script = os.path.join(os.path.dirname(__file__),
                          "parallel_consistency_main.py")
    out = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, timeout=600,
                         cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert b"PARALLEL-CONSISTENCY-OK" in out.stdout, (
        out.stdout.decode()[-2000:] + out.stderr.decode()[-2000:])
