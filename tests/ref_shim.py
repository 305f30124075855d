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


def load_reference_tower(which: str = "video"):
    """Load the reference's modeling_<which>.py as an executable module.

    Shims: a fake `peft` whose get_peft_model is identity (LoRA disabled —
    goldens compare against LoRA-free params, valid since fresh LoRA is a
    zero delta), and `_expand_mask` restored on transformers' modeling_clip
    (removed in newer releases)."""
    name = f"ref_languagebind_{which}"
    if name in sys.modules:
        return sys.modules[name + ".modeling"]

    import importlib.machinery

    import torch
    # import transformers BEFORE the fake peft lands in sys.modules
    # (its import_utils probes find_spec('peft'))
    from transformers.models.clip import modeling_clip as mc

    fake_peft = types.ModuleType("peft")
    fake_peft.__spec__ = importlib.machinery.ModuleSpec("peft", None)

    class _LoraConfig:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    fake_peft.LoraConfig = _LoraConfig
    fake_peft.get_peft_model = lambda model, config: model
    sys.modules.setdefault("peft", fake_peft)
    if not hasattr(mc, "_expand_mask"):
        def _expand_mask(mask, dtype, tgt_len=None):
            bsz, src_len = mask.size()
            tgt_len = tgt_len if tgt_len is not None else src_len
            expanded = mask[:, None, None, :].expand(
                bsz, 1, tgt_len, src_len).to(dtype)
            inverted = 1.0 - expanded
            return inverted.masked_fill(
                inverted.to(torch.bool), torch.finfo(dtype).min)
        mc._expand_mask = _expand_mask

    pkg_dir = f"/root/reference/languagebind/{which}"
    pkg = types.ModuleType(name)
    pkg.__path__ = [pkg_dir]
    sys.modules[name] = pkg

    spec = importlib.util.spec_from_file_location(
        f"{name}.configuration_{which}",
        f"{pkg_dir}/configuration_{which}.py")
    conf = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = conf
    spec.loader.exec_module(conf)

    spec = importlib.util.spec_from_file_location(
        f"{name}.modeling_{which}", f"{pkg_dir}/modeling_{which}.py")
    modeling = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = modeling
    spec.loader.exec_module(modeling)
    sys.modules[name + ".modeling"] = modeling
    return modeling
