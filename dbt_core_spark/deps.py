"""Package installation & resolution WITHOUT network access.

Re-expresses the reference's deps machinery (ref: deps/resolver.py:1-149,
deps/tarball.py:1-120, deps/git.py:1-195, deps/registry.py:1-130;
semver ref: semver.py) for the sources reachable in an offline
environment:

- ``tarball:`` — a local ``.tar.gz`` path or ``file://`` URL;
- ``git:`` — a local git repository path (+ ``revision``,
  ``subdirectory``), cloned via the git binary;
- ``package:`` — a DIRECTORY registry: ``<registry>/<name>/<ver>.tar.gz``
  with full semver range resolution (the hub protocol minus HTTP);
- ``local:`` — handled directly by ``ProjectDef.from_dir``.

``install()`` extracts everything into the project's
packages-install-path (default ``dbt_packages/``) and writes
``package-lock.yml`` (ref: PackageListing → lock file flow,
deps/resolver.py).  A later install with an unchanged ``packages.yml``
reuses the locked pins — the reproducible-build contract.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import subprocess
import tarfile
import tempfile
from typing import Any, Optional

import yaml

from dbt_core_spark.exceptions import ParsingError


# --------------------------------------------------------------------------
# semver (ref: dbt semver.py — the subset package specs actually use)
# --------------------------------------------------------------------------

_SEMVER_RE = re.compile(
    r"^(?P<op>>=|<=|>|<|=|~>)?\s*"
    r"(?P<major>\d+)(?:\.(?P<minor>\d+))?(?:\.(?P<patch>\d+))?"
    r"(?:-(?P<pre>[0-9A-Za-z.-]+))?$"
)


def parse_version(v: str) -> tuple:
    m = _SEMVER_RE.match(v.strip())
    if not m or m.group("op"):
        raise ParsingError(f"invalid version {v!r}")
    return (
        int(m.group("major")),
        int(m.group("minor") or 0),
        int(m.group("patch") or 0),
        # release sorts after any prerelease of the same triple
        m.group("pre") or "~",
    )


def _conditions(ranges) -> list[tuple[str, str]]:
    """Flatten a version spec (string | list of strings, each possibly
    comma-separated) into (op, version) conditions, ANDed together."""
    if ranges is None:
        return []
    items = ranges if isinstance(ranges, list) else [ranges]
    out: list[tuple[str, str]] = []
    for item in items:
        for part in str(item).split(","):
            part = part.strip()
            if not part:
                continue
            m = _SEMVER_RE.match(part)
            if not m:
                raise ParsingError(f"invalid version range {part!r}")
            op = m.group("op") or "="
            ver = part[len(m.group("op") or ""):].strip()
            out.append((op, ver))
    return out


def satisfies(version: str, ranges) -> bool:
    v = parse_version(version)
    for op, bound in _conditions(ranges):
        if op == "~>":
            # pessimistic: >= bound, < next significant release
            b = parse_version(bound)
            parts = bound.split("-")[0].split(".")
            if len(parts) >= 3:
                upper = (b[0], b[1] + 1, 0, "")
            else:
                upper = (b[0] + 1, 0, 0, "")
            if not (v >= b and v[:3] < upper[:3]):
                return False
            continue
        b = parse_version(bound)
        ok = {
            ">=": v >= b, "<=": v <= b, ">": v > b, "<": v < b, "=": v == b,
        }[op]
        if not ok:
            return False
    return True


def resolve_version(
    available: list[str], ranges, install_prerelease: bool = False
) -> Optional[str]:
    """Highest available version satisfying every condition; prerelease
    versions are skipped unless opted in (ref:
    resolve_to_specific_version deps/registry.py + install_prerelease)."""
    ok = [
        a for a in available
        if satisfies(a, ranges)
        and (install_prerelease or parse_version(a)[3] == "~")
    ]
    return max(ok, key=parse_version) if ok else None


# --------------------------------------------------------------------------
# installers
# --------------------------------------------------------------------------

def _extract_tarball(tar_path: str, install_dir: str) -> str:
    """Extract a package tarball; returns the installed package name.
    The project dir inside the tarball is located by its
    dbt_project.yml (tarballs usually wrap a top-level directory)."""
    if tar_path.startswith("file://"):
        tar_path = tar_path[len("file://"):]
    if not os.path.exists(tar_path):
        raise ParsingError(f"tarball not found: {tar_path}")
    with tempfile.TemporaryDirectory() as tmp:
        with tarfile.open(tar_path, "r:*") as tf:
            tf.extractall(tmp, filter="data")
        root = _find_project_root(tmp)
        if root is None:
            raise ParsingError(f"no dbt_project.yml inside {tar_path}")
        with open(os.path.join(root, "dbt_project.yml")) as f:
            name = (yaml.safe_load(f) or {}).get("name")
        if not name:
            raise ParsingError(f"package in {tar_path} has no name")
        dst = os.path.join(install_dir, name)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(root, dst)
    return name


def _find_project_root(path: str) -> Optional[str]:
    for dirpath, _dirs, files in os.walk(path):
        if "dbt_project.yml" in files:
            return dirpath
    return None


def _install_git(repo: str, install_dir: str, revision: Optional[str],
                 subdirectory: Optional[str]) -> str:
    """Clone a LOCAL git repository (ref: deps/git.py — same
    clone-and-checkout flow; remote URLs need network and error)."""
    if re.match(r"^(https?|git|ssh)://", repo) or repo.startswith("git@"):
        raise ParsingError(
            f"git package '{repo}': remote URLs require network access; "
            f"use a local repository path or a tarball"
        )
    if not os.path.isdir(repo):
        raise ParsingError(f"git repository not found: {repo}")
    with tempfile.TemporaryDirectory() as tmp:
        clone = os.path.join(tmp, "clone")
        subprocess.run(
            ["git", "clone", "--quiet", repo, clone],
            check=True, capture_output=True,
        )
        if revision:
            subprocess.run(
                ["git", "-C", clone, "checkout", "--quiet", revision],
                check=True, capture_output=True,
            )
        src = os.path.join(clone, subdirectory) if subdirectory else clone
        root = _find_project_root(src)
        if root is None:
            raise ParsingError(f"no dbt_project.yml under {repo}")
        with open(os.path.join(root, "dbt_project.yml")) as f:
            name = (yaml.safe_load(f) or {}).get("name")
        if not name:
            raise ParsingError(f"package in {repo} has no name")
        shutil.rmtree(os.path.join(root, ".git"), ignore_errors=True)
        dst = os.path.join(install_dir, name)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(root, dst)
    return name


def _registry_versions(registry: str, package: str) -> list[str]:
    pdir = os.path.join(registry, package.replace("/", os.sep))
    if not os.path.isdir(pdir):
        return []
    out = []
    for fn in os.listdir(pdir):
        if fn.endswith((".tar.gz", ".tgz")):
            out.append(fn.rsplit(".tar", 1)[0])
    return out


def _install_registry(registry: Optional[str], package: str, version,
                      install_dir: str,
                      install_prerelease: bool = False) -> tuple[str, str]:
    """Resolve a hub-style spec against a DIRECTORY registry
    (``<registry>/<name>/<version>.tar.gz``) — the offline analog of
    deps/registry.py.  Returns (installed name, resolved version)."""
    if not registry:
        raise ParsingError(
            f"package '{package}': hub installs need a registry — the "
            f"network hub is unreachable here; pass registry= (a directory "
            f"of <name>/<version>.tar.gz) or use tarball:/git:/local:"
        )
    avail = _registry_versions(registry, package)
    if not avail:
        raise ParsingError(f"package '{package}' not in registry {registry}")
    resolved = resolve_version(avail, version, install_prerelease)
    if resolved is None:
        raise ParsingError(
            f"package '{package}': no version in {sorted(avail)} "
            f"satisfies {version!r}"
        )
    tar = os.path.join(registry, package.replace("/", os.sep),
                       f"{resolved}.tar.gz")
    if not os.path.exists(tar):
        tar = os.path.join(registry, package.replace("/", os.sep),
                           f"{resolved}.tgz")
    return _extract_tarball(tar, install_dir), resolved


# --------------------------------------------------------------------------
# install + lockfile (ref: deps/resolver.py lock flow)
# --------------------------------------------------------------------------

def _packages_yml(project_dir: str) -> tuple[Optional[str], list[dict]]:
    for fn in ("packages.yml", "dependencies.yml"):
        fp = os.path.join(project_dir, fn)
        if os.path.exists(fp):
            with open(fp) as f:
                raw = f.read()
            doc = yaml.safe_load(raw) or {}
            return raw, [s for s in (doc.get("packages") or [])
                         if isinstance(s, dict)]
    return None, []


def read_lock(project_dir: str) -> Optional[dict]:
    fp = os.path.join(project_dir, "package-lock.yml")
    if not os.path.exists(fp):
        return None
    with open(fp) as f:
        return yaml.safe_load(f) or {}


def install(
    project_dir: str,
    registry: Optional[str] = None,
    install_path: Optional[str] = None,
) -> list[dict]:
    """``dbt deps``: install every non-local package spec into the
    packages-install-path and write ``package-lock.yml``.  When the lock
    matches the current packages.yml hash, locked pins are installed
    verbatim (reproducible builds).  Returns the lock entries."""
    raw, specs = _packages_yml(project_dir)
    if raw is None:
        return []
    sha = hashlib.sha1(raw.encode()).hexdigest()
    lock = read_lock(project_dir)
    if lock and lock.get("sha1_hash") == sha:
        specs = lock.get("packages") or specs  # pinned
    install_dir = install_path or os.path.join(project_dir, "dbt_packages")
    os.makedirs(install_dir, exist_ok=True)

    entries: list[dict] = []
    for spec in specs:
        if "local" in spec:
            entries.append(dict(spec))  # resolved in-place by from_dir
            continue
        if "tarball" in spec:
            tb = spec["tarball"]
            if re.match(r"^https?://", tb):
                raise ParsingError(
                    f"tarball '{tb}': remote URLs need network; use a "
                    f"local path or file:// URL"
                )
            if not os.path.isabs(tb) and not tb.startswith("file://"):
                tb = os.path.join(project_dir, tb)
            name = _extract_tarball(tb, install_dir)
            entries.append({**spec, "name": name})
        elif "git" in spec:
            repo = spec["git"]
            if not os.path.isabs(repo) and not re.match(r"^\w+://", repo):
                repo = os.path.join(project_dir, repo)
            name = _install_git(
                repo, install_dir, spec.get("revision"),
                spec.get("subdirectory"),
            )
            entries.append({**spec, "name": name})
        elif "package" in spec:
            name, resolved = _install_registry(
                registry, spec["package"], spec.get("version"), install_dir,
                bool(spec.get("install-prerelease")),
            )
            entries.append({**spec, "name": name, "version": resolved})
        else:
            kind = next(iter(spec), "?")
            raise ParsingError(f"unsupported package source '{kind}'")

    with open(os.path.join(project_dir, "package-lock.yml"), "w") as f:
        yaml.safe_dump({"packages": entries, "sha1_hash": sha}, f,
                       sort_keys=False)
    return entries
