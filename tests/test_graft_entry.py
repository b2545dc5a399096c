"""Driver-contract regression test: dryrun_multichip must keep compiling
and executing the full sharded train step + ring attention on a virtual
mesh (the round driver invokes it exactly this way)."""

import importlib.util
import os


def test_dryrun_multichip_8():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)  # asserts internally (finite loss, step==1)
