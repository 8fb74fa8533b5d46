"""CLI configuration system: param groups + persisted cfg_args.

Equivalent of the reference's reflection-based `ParamGroup` argparse system
(arguments/__init__.py:19-116): dataclass fields become --flags, booleans
become store_true, and the training stage persists the merged namespace to
<model_path>/cfg_args so render/metrics can re-load it
(get_combined_args, arguments/__init__.py:96-116).
"""

from __future__ import annotations

import dataclasses
import os
from argparse import ArgumentParser, Namespace
from pathlib import Path

from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig


@dataclasses.dataclass
class ModelParams:
    """Reference defaults: arguments/__init__.py:47-64."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    n_views: int = 0
    init_scale_from_view_depth: bool = False


@dataclasses.dataclass
class PipelineParams:
    """Reference: arguments/__init__.py:66-71. The SH/cov python paths are
    meaningless here (everything is XLA-compiled); kept for CLI compat."""

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # rasterizer backend: auto (probe dense vs binned per scene and keep
    # the faster — both exact) | pallas (dense) | pallas-binned | oracle
    backend: str = "auto"


def add_group(parser: ArgumentParser, cls_or_obj, abbrevs=()):
    """Register one dataclass's fields as CLI args."""
    obj = cls_or_obj() if isinstance(cls_or_obj, type) else cls_or_obj
    ab = dict(abbrevs)
    for f in dataclasses.fields(obj):
        name = f.name
        val = getattr(obj, name)
        flags = [f"--{name}"]
        if name in ab:
            flags.append(f"-{ab[name]}")
        if isinstance(val, bool):
            parser.add_argument(*flags, action="store_true", default=val)
        else:
            parser.add_argument(*flags, type=type(val), default=val)
    return obj


def extract_group(args: Namespace, cls):
    obj = cls()
    for f in dataclasses.fields(obj):
        if hasattr(args, f.name):
            setattr(obj, f.name, getattr(args, f.name))
    if hasattr(obj, "source_path") and obj.source_path:
        obj.source_path = os.path.abspath(obj.source_path)
    return obj


def make_opt_config(args: Namespace) -> OptimizationConfig:
    kw = {}
    for f in dataclasses.fields(OptimizationConfig):
        if hasattr(args, f.name):
            kw[f.name] = getattr(args, f.name)
    return OptimizationConfig(**kw)


def add_opt_group(parser: ArgumentParser):
    defaults = OptimizationConfig()
    for f in dataclasses.fields(OptimizationConfig):
        val = getattr(defaults, f.name)
        if isinstance(val, bool):
            parser.add_argument(f"--{f.name}", action="store_true",
                                default=val)
        else:
            parser.add_argument(f"--{f.name}", type=type(val), default=val)


def save_cfg_args(model_path, args: Namespace):
    """train.py:244-246: dump Namespace repr to <model_path>/cfg_args."""
    Path(model_path).mkdir(parents=True, exist_ok=True)
    with open(Path(model_path) / "cfg_args", "w") as f:
        f.write(str(Namespace(**vars(args))))


def get_combined_args(parser: ArgumentParser, argv=None):
    """Merge saved cfg_args (under --model_path) with the command line
    (arguments/__init__.py:96-116; CLI wins)."""
    cmdline = parser.parse_args(argv)
    try:
        cfg_path = Path(cmdline.model_path) / "cfg_args"
        cfg_string = cfg_path.read_text()
        args_cfgfile = eval(cfg_string)  # the file is a Namespace repr
    except (OSError, AttributeError):
        return cmdline
    merged = vars(args_cfgfile).copy()
    defaults = vars(parser.parse_args([]))
    for k, v in vars(cmdline).items():
        if k not in merged or v != defaults.get(k):
            merged[k] = v  # explicit CLI values override the saved config
    return Namespace(**merged)
