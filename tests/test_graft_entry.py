"""Driver-contract regression test: dryrun_multichip must be green when
invoked exactly the way the round driver does — from a process whose JAX
env is NOT pre-arranged for a virtual CPU mesh. Round 1 shipped a failure
here (MULTICHIP_r01.json rc=1) because the dryrun trusted the ambient
backend; it must now self-force the mesh in a fresh subprocess."""

import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_entry_traces_and_lowers():
    """entry() must return a jittable fn + example args: trace and lower
    it (no backend compile — the full-width R3D-50 takes minutes on
    XLA:CPU; the driver compile-checks it on the real chip)."""
    import jax

    sys.path.insert(0, ROOT)
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    assert "func" in lowered.as_text()[:2000] or lowered is not None
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape[0] == args[1].shape[0]  # batch preserved


def test_dryrun_multichip_8_without_conftest_env():
    """Spawn a fresh interpreter with conftest's CPU-mesh env stripped —
    the child sees whatever backend the image bakes in (the axon TPU
    tunnel under the driver), exactly like MULTICHIP_r0N.json's runner —
    and call dryrun_multichip(8). It must pass on its own."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    code = (
        f"import sys; sys.path.insert(0, {ROOT!r}); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('DRYRUN_CONTRACT_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_CONTRACT_OK" in proc.stdout
    assert "queue ptr advanced" in proc.stdout  # MoCo collectives certified
    assert "Sinkhorn" in proc.stdout  # SwAV distributed Sinkhorn certified
