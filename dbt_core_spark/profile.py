"""profiles.yml → target resolution (ref: config/profile.py,
config/renderer.py ProfileRenderer; pinned by tests/functional/profiles/).

A profile names a set of ``outputs`` (targets) plus the default
``target:``; ``dbt_project.yml``'s ``profile:`` selects which profile a
project uses and ``--target`` picks an output.  Spark-native: the
target's ``schema``/``threads`` configure the Engine, and the whole
output dict is exposed as the Jinja ``target`` context variable
(``target.name`` / ``target.schema`` / …).

``{{ env_var('NAME', 'default') }}`` is rendered inside profile values,
like the reference's ProfileRenderer (secrets stay out of YAML).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml

from dbt_core_spark.exceptions import ParsingError

DEFAULT_PROFILES_DIR = os.path.expanduser("~/.dbt")

_ENV_VAR_RE = re.compile(
    r"\{\{\s*env_var\(\s*['\"](?P<name>[^'\"]+)['\"]"
    r"(?:\s*,\s*['\"](?P<default>[^'\"]*)['\"])?\s*\)\s*\}\}"
)


@dataclass
class Target:
    """One resolved profile output."""

    name: str
    schema: Optional[str] = None
    threads: int = 4
    type: str = "spark"
    profile_name: str = ""
    extra: dict[str, Any] = field(default_factory=dict)

    def to_context(self) -> dict[str, Any]:
        """The Jinja ``target`` variable (ref: target context,
        context/base.py TargetContext)."""
        return {
            "name": self.name,
            "schema": self.schema,
            "threads": self.threads,
            "type": self.type,
            "profile_name": self.profile_name,
            **self.extra,
        }


def _render(value: Any) -> Any:
    if isinstance(value, str):
        def sub(m: "re.Match[str]") -> str:
            name, default = m.group("name"), m.group("default")
            got = os.environ.get(name, default)
            if got is None:
                raise ParsingError(f"env_var '{name}' is not set")
            return got

        return _ENV_VAR_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _render(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_render(v) for v in value]
    return value


def load_profiles(profiles_dir: Optional[str] = None) -> dict[str, Any]:
    """Read profiles.yml from ``profiles_dir`` (default ~/.dbt), like
    the reference's read_profile (env DBT_PROFILES_DIR honored)."""
    d = profiles_dir or os.environ.get("DBT_PROFILES_DIR") or DEFAULT_PROFILES_DIR
    fp = os.path.join(d, "profiles.yml")
    if not os.path.exists(fp):
        return {}
    with open(fp) as f:
        return yaml.safe_load(f) or {}


def resolve_target(
    profiles: dict[str, Any],
    profile_name: str,
    target_name: Optional[str] = None,
) -> Target:
    """Pick an output from a profile (ref: Profile.from_raw_profile_info
    config/profile.py): ``target_name`` overrides the profile's default
    ``target:``; unknown profiles/targets error with the valid choices."""
    prof = profiles.get(profile_name)
    if prof is None:
        raise ParsingError(
            f"profile '{profile_name}' not found "
            f"(have: {sorted(profiles) or 'none'})"
        )
    outputs = prof.get("outputs") or {}
    tname = target_name or prof.get("target")
    if not tname:
        raise ParsingError(f"profile '{profile_name}' has no default target")
    out = outputs.get(tname)
    if out is None:
        raise ParsingError(
            f"target '{tname}' not in profile '{profile_name}' "
            f"(have: {sorted(outputs)})"
        )
    out = _render(dict(out))
    known = {"schema", "threads", "type"}
    return Target(
        name=tname,
        schema=out.get("schema"),
        threads=int(out.get("threads") or 4),
        type=out.get("type") or "spark",
        profile_name=profile_name,
        extra={k: v for k, v in out.items() if k not in known},
    )
