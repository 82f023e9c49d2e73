"""Hydra-style hierarchical config composition and instantiation.

A self-contained clean-room engine providing the config surface of the
reference (`/root/reference/conf/**`, hydra 1.2 semantics subset): YAML config
groups with `defaults:` lists, `@package` directives, command-line overrides
(`group=option`, `key.sub=value`, `+key=value`, `~key`), `${...}`
interpolation, and an `${eval:...}` resolver for inline arithmetic, plus
`instantiate()` for `_target_`/`_partial_` object construction.

Implemented from scratch because hydra/omegaconf are not available in this
environment; the override grammar matches the reference README usage, e.g.
`python scripts/main.py target=dw_shift solver=basic_dis loss.method=lv`.
"""
from __future__ import annotations

import copy
import datetime
import functools
import importlib
import math
import os
import re
from pathlib import Path
from typing import Any

import yaml


class ConfigError(Exception):
    pass


# ---------------------------------------------------------------------------
# Dict helpers
# ---------------------------------------------------------------------------


def deep_merge(dst: dict, src: dict) -> dict:
    """Merge ``src`` into ``dst`` (in place); ``src`` wins on conflicts."""
    for key, value in src.items():
        if isinstance(value, dict) and isinstance(dst.get(key), dict):
            deep_merge(dst[key], value)
        else:
            dst[key] = copy.deepcopy(value)
    return dst


def _materialize_interp_dict(cfg: dict, value: Any) -> dict | None:
    """If `value` is a full-string `${path}` interpolation resolving to a
    dict, return a deep copy of that dict (else None). Lets dotted overrides
    write INTO interpolation-valued keys (e.g. `eval_timesteps.steps=400`
    when `eval_timesteps: ${train_timesteps}`): the alias is expanded first,
    so the override doesn't clobber the aliased config with a bare dict."""
    if not isinstance(value, str):
        return None
    match = _INTERP_RE.fullmatch(value)
    if match is None:
        return None
    ref = match.group(1).strip()
    if ref.startswith(("eval:", "oc.env:", "now:")):
        return None
    target = get_by_path(cfg, ref)
    return copy.deepcopy(target) if isinstance(target, dict) else None


def set_by_path(cfg: dict, dotted: str, value: Any, *, allow_new: bool = True):
    keys = dotted.split(".")
    node = cfg
    for key in keys[:-1]:
        if key in node and not isinstance(node[key], dict):
            expanded = _materialize_interp_dict(cfg, node[key])
            if expanded is not None:
                node[key] = expanded
        if key not in node or not isinstance(node[key], dict):
            if not allow_new and key not in node:
                raise ConfigError(f"Cannot override missing key: {dotted}")
            node[key] = {}
        node = node[key]
    if not allow_new and keys[-1] not in node:
        raise ConfigError(
            f"Could not override '{dotted}'. Key is not in the config. "
            f"Use +{dotted}=... to add it."
        )
    node[keys[-1]] = value


def get_by_path(cfg: dict, dotted: str, default=None):
    node = cfg
    for key in dotted.split("."):
        if not isinstance(node, dict) or key not in node:
            return default
        node = node[key]
    return node


def del_by_path(cfg: dict, dotted: str):
    keys = dotted.split(".")
    node = cfg
    for key in keys[:-1]:
        node = node[key]
    del node[keys[-1]]


# ---------------------------------------------------------------------------
# Composition
# ---------------------------------------------------------------------------

_PACKAGE_RE = re.compile(r"^#\s*@package\s+(\S+)\s*$", re.MULTILINE)
# YAML 1.1 reads `1e4` as a string; hydra/omegaconf coerce it to float.
_NUMBER_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce_numbers(value):
    if isinstance(value, str) and _NUMBER_RE.match(value):
        return float(value)
    if isinstance(value, dict):
        return {k: _coerce_numbers(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_coerce_numbers(v) for v in value]
    return value


def _load_yaml(path: Path) -> tuple[dict, str | None]:
    text = path.read_text()
    match = _PACKAGE_RE.search(text)
    package = match.group(1) if match else None
    data = _coerce_numbers(yaml.safe_load(text))
    if data is None:
        data = {}
    if not isinstance(data, (dict, list)):
        raise ConfigError(f"Config {path} must be a mapping or list.")
    return data, package


def _join_pkg(*parts: str) -> str:
    return ".".join(p for p in parts if p)


class _Composer:
    def __init__(self, config_dir: Path, group_overrides: dict[str, str]):
        self.config_dir = Path(config_dir)
        self.group_overrides = dict(group_overrides)
        self.used_overrides: set[str] = set()

    def _file_for(self, group: str, option: str) -> Path:
        path = self.config_dir / group / f"{option}.yaml"
        if not path.exists():
            avail = sorted(
                p.stem for p in (self.config_dir / group).glob("*.yaml")
            ) if (self.config_dir / group).is_dir() else []
            raise ConfigError(
                f"Could not find '{option}' in config group '{group or '.'}'. "
                f"Available options: {avail}"
            )
        return path

    def _parse_entry(self, entry) -> tuple[str, str | None, str | None]:
        """Return (group_spec, option, None) for a defaults-list entry."""
        if isinstance(entry, str):
            return entry, None, None
        if isinstance(entry, dict) and len(entry) == 1:
            (group_spec, option), = entry.items()
            if option is not None and not isinstance(option, str):
                option = str(option)
            return group_spec, option, None
        raise ConfigError(f"Malformed defaults entry: {entry!r}")

    def compose_file(self, group: str, option: str, package: str | None) -> dict:
        """Compose the config rooted at group/option into a root-level dict."""
        path = self._file_for(group, option)
        data, pkg_directive = _load_yaml(path)

        if pkg_directive is not None:
            if pkg_directive == "_global_":
                package = ""
            elif pkg_directive == "_group_":
                pass  # keep the passed-in (group-derived) package
            else:
                package = pkg_directive

        defaults = data.pop("defaults", None) if isinstance(data, dict) else None
        body = data

        result: dict = {}
        self_merged = False
        if defaults is not None:
            for entry in defaults:
                group_spec, opt, _ = self._parse_entry(entry)
                if group_spec == "_self_":
                    self._merge_at(result, package, body)
                    self_merged = True
                    continue
                sub = self._compose_default(
                    group, package, group_spec, opt,
                    overridable=isinstance(entry, dict),
                )
                deep_merge(result, sub)
        if not self_merged:
            self._merge_at(result, package, body)
        return result

    def _compose_default(
        self, parent_group: str, parent_package: str | None,
        group_spec: str, option: str | None,
        overridable: bool = True,
    ) -> dict:
        # Split off package annotation
        if "@" in group_spec:
            group_part, pkg_annot = group_spec.split("@", 1)
        else:
            group_part, pkg_annot = group_spec, None

        absolute = group_part.startswith("/")
        group_part = group_part.lstrip("/")

        if absolute or not parent_group:
            group = group_part
        else:
            group = f"{parent_group}/{group_part}" if group_part else parent_group

        # Group may contain no '/', e.g. a root-level config like 'setup'
        if not (self.config_dir / group).is_dir():
            # 'setup' in the root group: group='' and option='setup'
            candidate = self.config_dir / f"{group}.yaml"
            if candidate.exists() and option is None:
                option = group.split("/")[-1]
                group = "/".join(group.split("/")[:-1])

        # Apply command-line group overrides (match several spellings).
        # Bare-string defaults (direct file includes like `- oc_base`) are
        # not overridable groups in hydra semantics.
        if overridable:
            override_keys = [group_spec.lstrip("/"), group.replace("/", ".")]
            if pkg_annot:
                override_keys.append(f"{group}@{pkg_annot}".lstrip("/"))
                override_keys.append(pkg_annot)
            for key in override_keys:
                if key in self.group_overrides:
                    option = self.group_overrides[key]
                    self.used_overrides.add(key)
                    break

        if option is None or option == "null":
            return {}

        # Default package
        parent_pkg = parent_package or ""
        if pkg_annot is not None:
            if pkg_annot == "_global_":
                package = ""
            else:
                package = _join_pkg(parent_pkg, pkg_annot)
        else:
            leaf = group.split("/")[-1] if group else ""
            if absolute:
                package = leaf
            else:
                package = _join_pkg(parent_pkg, leaf)

        return self.compose_file(group, option, package)

    @staticmethod
    def _merge_at(result: dict, package: str | None, body):
        if isinstance(body, list):
            # List-bodied config files replace the value at their package.
            if not package:
                raise ConfigError("A list config needs a non-root package.")
            keys = package.split(".")
            node = result
            for key in keys[:-1]:
                node = node.setdefault(key, {})
            node[keys[-1]] = copy.deepcopy(body)
            return
        if not package:
            deep_merge(result, body)
        else:
            node = result
            for key in package.split("."):
                node = node.setdefault(key, {})
            deep_merge(node, body)


def _parse_override_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def compose(
    config_dir: str | Path,
    config_name: str = "base",
    overrides: list[str] | None = None,
    resolve: bool = True,
) -> dict:
    """Compose a config like `hydra.compose`, applying CLI-style overrides."""
    overrides = list(overrides or [])
    group_overrides: dict[str, str] = {}
    value_overrides: list[tuple[str, str, Any]] = []  # (mode, key, value)

    config_dir = Path(config_dir)
    for ov in overrides:
        if ov.startswith("~"):
            value_overrides.append(("del", ov[1:].split("=")[0], None))
            continue
        if "=" not in ov:
            raise ConfigError(f"Malformed override (expected key=value): {ov!r}")
        key, _, raw = ov.partition("=")
        mode = "set"
        if key.startswith("+"):
            mode, key = "add", key[1:]
        # A group override: the key (or its first component) names a config
        # group directory and the value names a yaml file in it. Hydra's
        # `+group@pkg=option` (add a group entry absent from the defaults
        # list) composes identically — for us every group override not
        # consumed by a defaults entry is merged at root anyway.
        group_key = key.replace(".", "/").split("@")[0]
        if mode in ("set", "add") and (config_dir / group_key).is_dir():
            if not (config_dir / group_key / f"{raw}.yaml").exists():
                avail = sorted(
                    p.stem for p in (config_dir / group_key).glob("*.yaml")
                )
                raise ConfigError(
                    f"Could not find '{raw}' in config group '{group_key}'. "
                    f"Available options: {avail}"
                )
            group_overrides[key] = raw
        else:
            value_overrides.append((mode, key, _parse_override_value(raw)))

    composer = _Composer(config_dir, group_overrides)
    cfg = composer.compose_file("", config_name, "")

    unused = set(group_overrides) - composer.used_overrides
    for key in sorted(unused):
        # Treat as adding/overriding the group at root level
        sub = composer.compose_file(
            key.replace(".", "/").split("@")[0],
            group_overrides[key],
            key.split("@", 1)[1] if "@" in key else key.split(".")[-1],
        )
        deep_merge(cfg, sub)

    for mode, key, value in value_overrides:
        if mode == "del":
            del_by_path(cfg, key)
        else:
            set_by_path(cfg, key, value, allow_new=True)

    if resolve:
        cfg = resolve_interpolations(cfg)
    return cfg


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")

_EVAL_GLOBALS = {
    "__builtins__": {},
    "int": int, "float": float, "min": min, "max": max, "abs": abs,
    "round": round, "len": len, "pow": pow, "math": math,
    "sqrt": math.sqrt, "log": math.log, "exp": math.exp, "pi": math.pi,
}


def _format_scalar(value: Any) -> str:
    if isinstance(value, bool):
        return str(value)
    return str(value)


def resolve_interpolations(cfg: dict) -> dict:
    """Resolve all `${...}` references in the config, in place."""
    resolving: set[str] = set()

    def resolve_ref(ref: str) -> Any:
        ref = ref.strip()
        if ref.startswith("eval:"):
            expr = resolve_str(ref[len("eval:"):])
            if isinstance(expr, str):
                expr = expr.strip()
                if len(expr) >= 2 and expr[0] == expr[-1] and expr[0] in "'\"":
                    expr = expr[1:-1]
            try:
                return eval(expr, dict(_EVAL_GLOBALS))  # noqa: S307
            except Exception as exc:  # pragma: no cover
                raise ConfigError(f"eval resolver failed for {expr!r}: {exc}")
        if ref.startswith("oc.env:"):
            spec = ref[len("oc.env:"):]
            name, _, default = spec.partition(",")
            return os.environ.get(name.strip(), default.strip() or None)
        if ref.startswith("now:"):
            return datetime.datetime.now().strftime(ref[len("now:"):])
        if ref in resolving:
            raise ConfigError(f"Circular interpolation at '{ref}'")
        resolving.add(ref)
        try:
            value = get_by_path(cfg, ref, default=ConfigError)
            if value is ConfigError:
                raise ConfigError(f"Interpolation key not found: '{ref}'")
            return resolve_value(value, write_back=ref)
        finally:
            resolving.discard(ref)

    def resolve_str(text: str) -> Any:
        prev = None
        while prev != text:
            # A full-string single interpolation keeps the value's type.
            # Re-checked each round so nested forms like
            # ${eval:"...${train_steps}..."} resolve to typed values once the
            # inner references have been substituted.
            match = _INTERP_RE.fullmatch(text)
            if match:
                return resolve_ref(match.group(1))
            prev = text

            def sub(m):
                val = resolve_ref(m.group(1))
                return _format_scalar(val)

            text = _INTERP_RE.sub(sub, text)
        return text

    def resolve_value(value: Any, write_back: str | None = None) -> Any:
        if isinstance(value, str) and "${" in value:
            result = resolve_str(value)
            if isinstance(result, str) and "${" in result:
                result = resolve_str(result)
            if write_back is not None:
                set_by_path(cfg, write_back, result)
            return result
        if isinstance(value, dict):
            for key in list(value):
                value[key] = resolve_value(value[key])
            return value
        if isinstance(value, list):
            return [resolve_value(v) for v in value]
        return value

    resolve_value(cfg)
    return cfg


# ---------------------------------------------------------------------------
# Instantiation
# ---------------------------------------------------------------------------


def locate(path: str) -> Any:
    """Import a dotted path to a class/function/object."""
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(module_name)
        except ModuleNotFoundError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    raise ConfigError(f"Could not locate '{path}'")


def instantiate(cfg: Any, /, *args, **kwargs) -> Any:
    """Instantiate `_target_` configs recursively (hydra.utils.instantiate)."""
    if cfg is None:
        return None
    if isinstance(cfg, (list, tuple)):
        return [instantiate(v) for v in cfg]
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) for k, v in cfg.items()}

    cfg = dict(cfg)
    target = cfg.pop("_target_")
    partial = cfg.pop("_partial_", False)
    cfg.pop("_recursive_", None)
    cfg.pop("_convert_", None)

    call_kwargs = {}
    for key, value in cfg.items():
        if isinstance(value, dict) and "_target_" in value:
            call_kwargs[key] = instantiate(value)
        elif isinstance(value, list):
            call_kwargs[key] = [
                instantiate(v) if isinstance(v, dict) and "_target_" in v else v
                for v in value
            ]
        else:
            call_kwargs[key] = value
    call_kwargs.update(kwargs)

    fn = locate(target)
    if partial:
        return functools.partial(fn, *args, **call_kwargs)
    return fn(*args, **call_kwargs)
