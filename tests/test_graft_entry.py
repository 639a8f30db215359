"""Driver-contract tests for __graft_entry__ (compile check + multichip dryrun).

The round-1 failure mode being pinned: ``dryrun_multichip(n)`` must work even
when the visible backend has fewer than ``n`` devices (it re-execs a child
with a virtual CPU mesh).  Under the test env the conftest already provisions
8 CPU devices, so the in-process path runs; the subprocess path is exercised
by requesting more devices than the parent has.
"""

import jax

import __graft_entry__ as g


def test_entry_compiles():
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 13, 13, 20)


def test_dryrun_multichip_inprocess(capsys):
    g.dryrun_multichip(8)
    assert "mesh={'data': 4, 'model': 2}" in capsys.readouterr().out


def test_dryrun_multichip_reexec(capsys):
    # Parent has 8 devices; asking for 16 forces the subprocess path.
    g.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip(16)" in out and "ok" in out
