"""Minimal fake of the `tl2` framework so the ACTUAL reference torch modules
(`/root/reference/exp/...`) can be imported and executed for parity testing.

The reference depends on the external tl2 pip package (SURVEY §1) for a
config object, a model registry, verbose-forward hooks, and init helpers.
Only the surface the model files touch at import/init/forward time is faked:

  tl2.tl2_utils.{get_class_repr, dict2string, parser_args_from_list}
  tl2.launch.launch_utils.global_cfg            (.tl_debug False)
  tl2.proj.fvcore.{MODEL_REGISTRY, build_model}
  tl2.proj.stylegan2_ada.persistence.persistent_class
  tl2.proj.pytorch.{torch_utils, init_func}
  tl2.proj.pytorch.pytorch_hook.VerboseModel

`init_func.kaiming_leaky_init` is implemented for real (kaiming normal,
a=0.2, fan_in — the tl2 behavior, same as `_kaiming_leaky_init` in
`exp/comm/models/multi_head_mapping.py:21`) because model constructors apply
it; the parity tests convert whatever weights result, so only validity
matters, not the exact distribution.

Also stubs `easydict` and `streamlit` (imported at module level by
`exp/comm/comm_utils.py` but unused in the model forward paths).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


class _Registry:
    def __init__(self):
        self._objs = {}

    def register(self, name_prefix=None, name=None):
        def deco(cls):
            key = f"{name_prefix}.{cls.__name__}" if name_prefix else (name or cls.__name__)
            self._objs[key] = cls
            return cls

        return deco

    def get(self, key):
        return self._objs[key]


class _GlobalCfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            if k.startswith("tl_"):
                return False
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        return super().get(k, default)


def install(reference_root: str = REFERENCE_ROOT) -> None:
    """Idempotently install the tl2 stub and put the reference on sys.path."""
    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)
    if "tl2" in sys.modules:
        return

    import torch.nn as nn

    tl2 = _module("tl2")

    tl2_utils = _module("tl2.tl2_utils")
    tl2_utils.get_class_repr = lambda obj, *a, **k: obj.__class__.__name__
    tl2_utils.dict2string = lambda dict_obj=None, *a, **k: str(dict_obj)
    tl2_utils.parser_args_from_list = lambda *a, **k: ([], [])
    tl2.tl2_utils = tl2_utils

    launch = _module("tl2.launch")
    launch_utils = _module("tl2.launch.launch_utils")
    launch_utils.global_cfg = _GlobalCfg(tl_debug=False)
    launch.launch_utils = launch_utils
    tl2.launch = launch

    proj = _module("tl2.proj")
    tl2.proj = proj

    fvcore = _module("tl2.proj.fvcore")
    fvcore.MODEL_REGISTRY = _Registry()
    fvcore.build_model = lambda cfg, **kw: fvcore.MODEL_REGISTRY.get(cfg["name"])(
        **{k: v for k, v in cfg.items() if k not in ("name", "register_modules")}, **kw
    )
    proj.fvcore = fvcore

    sg2 = _module("tl2.proj.stylegan2_ada")
    persistence = _module("tl2.proj.stylegan2_ada.persistence")
    persistence.persistent_class = lambda cls: cls
    sg2.persistence = persistence
    proj.stylegan2_ada = sg2

    pytorch = _module("tl2.proj.pytorch")
    torch_utils = _module("tl2.proj.pytorch.torch_utils")
    torch_utils.print_number_params = lambda *a, **k: None
    pytorch.torch_utils = torch_utils

    init_func = _module("tl2.proj.pytorch.init_func")

    def kaiming_leaky_init(m):
        if isinstance(m, nn.Linear):
            nn.init.kaiming_normal_(m.weight, a=0.2, mode="fan_in", nonlinearity="leaky_relu")

    init_func.kaiming_leaky_init = kaiming_leaky_init
    pytorch.init_func = init_func

    pytorch_hook = _module("tl2.proj.pytorch.pytorch_hook")

    class VerboseModel:
        def __init__(self, *a, **k):
            pass

        @staticmethod
        def forward_verbose(*a, **k):
            return None

    pytorch_hook.VerboseModel = VerboseModel
    pytorch.pytorch_hook = pytorch_hook
    proj.pytorch = pytorch

    if "easydict" not in sys.modules:
        easydict = _module("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        easydict.EasyDict = EasyDict

    if "streamlit" not in sys.modules:
        st = _module("streamlit")
        st.__getattr__ = lambda name: (lambda *a, **k: None)

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        transforms = _module("torchvision.transforms")
        trans_f = _module("torchvision.transforms.functional")
        trans_f.__getattr__ = lambda name: (lambda *a, **k: None)
        transforms.functional = trans_f
        tv.transforms = transforms
