"""Load the reference's `baseline.py` module from its read-only mount for
test-time golden comparison.

The reference module imports `languagebind` (heavy native deps) and
`torch_geometric` (not installed); both are replaced with minimal fake
modules BEFORE loading — only names baseline.py touches at import time.
Nothing from the reference is copied into the repo; the module is executed
in place purely to generate goldens."""
import importlib.util
import sys
import types

REF_BASELINE = "/root/reference/src/model/baseline.py"


def load_reference_baseline():
    if "ref_baseline" in sys.modules:
        return sys.modules["ref_baseline"]

    fake_lb = types.ModuleType("languagebind")
    for name in ("LanguageBind", "to_device", "transform_dict",
                 "LanguageBindImageTokenizer"):
        setattr(fake_lb, name, object())
    sys.modules.setdefault("languagebind", fake_lb)

    fake_tg = types.ModuleType("torch_geometric")
    fake_tg_nn = types.ModuleType("torch_geometric.nn")
    fake_tg_data = types.ModuleType("torch_geometric.data")
    fake_tg_nn.SuperGATConv = object
    fake_tg_data.Batch = object
    fake_tg_data.Data = object
    fake_tg.nn = fake_tg_nn
    fake_tg.data = fake_tg_data
    sys.modules.setdefault("torch_geometric", fake_tg)
    sys.modules.setdefault("torch_geometric.nn", fake_tg_nn)
    sys.modules.setdefault("torch_geometric.data", fake_tg_data)

    spec = importlib.util.spec_from_file_location("ref_baseline",
                                                  REF_BASELINE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_baseline"] = mod
    return mod
