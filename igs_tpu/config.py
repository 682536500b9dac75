"""Config system — YAML + ``extends`` + ${...} interpolation + CLI dotlist.

A dependency-free reimplementation of the reference's OmegaConf usage
(igs/utils/config.py:1-75): three-section ExperimentConfig (opt/data/system),
custom resolvers (gt0, mul, shsdim, …), ``extends`` chaining, and CLI
``a.b.c=value`` overrides, so the reference's YAML configs load unmodified.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

_RESOLVERS = {
    "calc_exp_lr_decay_rate": lambda factor, n: float(factor) ** (1.0 / float(n)),
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "idiv": lambda a, b: a // b,
    "basename": os.path.basename,
    "rmspace": lambda s, sub: s.replace(" ", sub),
    "tuple2": lambda s: [float(s), float(s)],
    "gt0": lambda s: s > 0,
    "not": lambda s: not s,
    "shsdim": lambda sh_degree: (int(sh_degree) + 1) ** 2 * 3,
}

_INTERP = re.compile(r"\$\{([^${}]+)\}")


def _get_path(cfg: Dict, dotted: str):
    cur = cfg
    for part in dotted.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


_SCI_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _parse_scalar(s: str) -> Any:
    v = yaml.safe_load(s)
    # YAML 1.1 treats "5e-4" (no dot) as a string; coerce numeric-looking
    # scalars so reference configs like "lr: 4e-4" load as floats
    if isinstance(v, str) and _SCI_FLOAT.match(v):
        return float(v)
    return v


def _resolve_value(val: Any, root: Dict, depth=0) -> Any:
    if depth > 20:
        raise ValueError("interpolation recursion limit")
    if isinstance(val, str):
        if _SCI_FLOAT.match(val):
            return float(val)
        m = _INTERP.fullmatch(val.strip())
        if m:
            return _resolve_expr(m.group(1), root, depth)
        # partial interpolation inside a longer string. A NESTED form like
        # ``${gt0:${opt.lambda_render_flow}}`` reaches here too (the inner
        # ${} blocks the fullmatch): after each substitution pass re-check
        # whether the remainder is a single interpolation and resolve it
        # NATIVELY — otherwise the resolver result would be stringified
        # ("False") and downstream bool() would read it as truthy.
        def sub(match):
            r = _resolve_expr(match.group(1), root, depth)
            return str(r)

        out = _INTERP.sub(sub, val)
        while _INTERP.search(out):
            m = _INTERP.fullmatch(out.strip())
            if m:
                return _resolve_expr(m.group(1), root, depth)
            out = _INTERP.sub(sub, out)
        return out
    return val


def _resolve_expr(expr: str, root: Dict, depth: int) -> Any:
    if ":" in expr:
        name, argstr = expr.split(":", 1)
        if name in _RESOLVERS:
            args = [
                _resolve_value(a.strip(), root, depth + 1)
                if a.strip().startswith("${")
                else _parse_scalar(a.strip())
                for a in argstr.split(",")
            ]
            return _RESOLVERS[name](*args)
    v = _get_path(root, expr)
    return _resolve_value(v, root, depth + 1)


def _resolve_tree(node: Any, root: Dict) -> Any:
    if isinstance(node, dict):
        return {k: _resolve_tree(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_tree(v, root) for v in node]
    return _resolve_value(node, root)


def merge(base: Any, override: Any) -> Any:
    if isinstance(base, dict) and isinstance(override, dict):
        out = dict(base)
        for k, v in override.items():
            out[k] = merge(out.get(k), v) if k in out else v
        return out
    return override


def _apply_dotlist(cfg: Dict, dotlist: List[str]) -> Dict:
    for item in dotlist:
        if "=" not in item:
            continue
        key, val = item.split("=", 1)
        parts = key.strip().split(".")
        cur = cfg
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_scalar(val)
    return cfg


@dataclass
class ExperimentConfig:
    """Parity: igs/utils/config.py:34-38."""

    n_gpus: int = 1
    opt: Dict[str, Any] = field(default_factory=dict)
    data: Dict[str, Any] = field(default_factory=dict)
    system: Dict[str, Any] = field(default_factory=dict)

    def __getitem__(self, k):
        return getattr(self, k)


def load_config(
    *yamls: str,
    cli_args: Optional[List[str]] = None,
    from_string: bool = False,
    **kwargs,
) -> ExperimentConfig:
    """Parity: load_config (igs/utils/config.py:40-61)."""
    confs = []
    for y in yamls:
        conf = yaml.safe_load(y) if from_string else yaml.safe_load(open(y))
        conf = conf or {}
        extends = conf.pop("extends", None)
        if extends:
            assert os.path.exists(extends), f"File {extends} does not exist."
            confs.append(yaml.safe_load(open(extends)))
        confs.append(conf)
    cfg: Dict[str, Any] = {}
    for c in confs:
        cfg = merge(cfg, c)
    if cli_args:
        cfg = _apply_dotlist(cfg, cli_args)
    cfg = merge(cfg, kwargs)
    cfg = _resolve_tree(cfg, cfg)
    known = {k: v for k, v in cfg.items() if k in ("n_gpus", "opt", "data", "system")}
    return ExperimentConfig(**known)


def dump_config(path: str, config: ExperimentConfig):
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "n_gpus": config.n_gpus,
                "opt": config.opt,
                "data": config.data,
                "system": config.system,
            },
            f,
        )


def parse_structured(cls, cfg: Optional[Dict] = None):
    """Instantiate a dataclass from a dict, ignoring unknown keys loudly off.

    Parity shim for igs/utils/config.py:73-75 — unknown keys raise (same as
    dataclass **kwargs), keeping configs honest.
    """
    return cls(**(cfg or {}))
