"""--distributed parsing + wiring (reference train_ddp.py:145 `env://`
rendezvous equivalent).

The failure mode pinned here: the flag used to be plain _bool, so the
documented 'host:port,N,i' form coerced to False and silently ran
single-host. Now the triple parses loudly and reaches
jax.distributed.initialize with explicit kwargs."""
import pytest

from missm_tpu.compat.args import train_args
from missm_tpu.cli import common as cli_common


def test_distributed_bool_forms():
    assert train_args(["--distributed", "true"]).distributed is True
    assert train_args(["--distributed", "false"]).distributed is False
    assert train_args([]).distributed is False


def test_distributed_triple_parses():
    args = train_args(["--distributed", "10.0.0.1:8476,4,2"])
    assert args.distributed == ("10.0.0.1:8476", 4, 2)


@pytest.mark.parametrize("bad", [
    "10.0.0.1:8476,4",          # missing process_id
    "10.0.0.1,4,2",             # no port
    "10.0.0.1:8476,x,2",        # non-integer
    "10.0.0.1:8476,4,4",        # process_id out of range
    "10.0.0.1:8476,0,0",        # zero processes
])
def test_distributed_malformed_is_loud(bad):
    with pytest.raises(SystemExit):
        train_args(["--distributed", bad])


def test_maybe_init_distributed_wiring(monkeypatch):
    calls = []

    def fake_init(**kw):
        calls.append(kw)

    monkeypatch.setattr(cli_common.jax.distributed, "initialize", fake_init)

    ns = train_args(["--distributed", "host:1234,2,1"])
    cli_common.maybe_init_distributed(ns)
    assert calls == [{"coordinator_address": "host:1234",
                      "num_processes": 2, "process_id": 1}]

    calls.clear()
    cli_common.maybe_init_distributed(train_args(["--distributed", "true"]))
    assert calls == [{}]

    calls.clear()
    cli_common.maybe_init_distributed(train_args([]))
    assert calls == []
