"""Offline package installation: tarball, local git, directory-registry
semver resolution, and the package-lock round-trip
(ref: deps/resolver.py, deps/tarball.py, deps/git.py, deps/registry.py,
tests/functional/dependencies/)."""

import os
import subprocess
import tarfile

import pytest
import yaml

from dbt_core_spark import deps
from dbt_core_spark.exceptions import ParsingError
from dbt_core_spark.project import ProjectDef


def _make_pkg_dir(root, name, version="1.0.0", model_sql="select 1 as one"):
    d = os.path.join(root, f"src_{name}_{version}")
    os.makedirs(os.path.join(d, "models"))
    os.makedirs(os.path.join(d, "macros"))
    with open(os.path.join(d, "dbt_project.yml"), "w") as f:
        yaml.safe_dump({"name": name, "version": version}, f)
    with open(os.path.join(d, "models", f"{name}_model.sql"), "w") as f:
        f.write(model_sql)
    with open(os.path.join(d, "macros", "helper.sql"), "w") as f:
        f.write("{% macro " + name + "_greet() %}select 'hi'{% endmacro %}")
    return d


def _tar(src_dir, tar_path):
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(src_dir, arcname=os.path.basename(src_dir))
    return tar_path


def test_semver_resolution():
    avail = ["0.9.9", "1.0.0", "1.1.0", "1.2.3", "2.0.0", "1.3.0-b1"]
    assert deps.resolve_version(avail, [">=1.0.0", "<2.0.0"]) == "1.2.3"
    assert deps.resolve_version(avail, "~> 1.1") == "1.2.3"
    assert deps.resolve_version(avail, "~> 1.1.0") == "1.1.0"
    assert deps.resolve_version(avail, "=2.0.0") == "2.0.0"
    assert deps.resolve_version(avail, ">=3.0.0") is None
    assert deps.satisfies("1.3.0-b1", [">=1.2.3"])  # prerelease ordering
    assert not deps.satisfies("1.3.0-b1", [">=1.3.0"])


def test_tarball_install_and_lock(tmp_path):
    proj = str(tmp_path / "proj")
    os.makedirs(os.path.join(proj, "models"))
    with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
        yaml.safe_dump({"name": "root"}, f)
    with open(os.path.join(proj, "models", "m.sql"), "w") as f:
        f.write("select * from {{ ref('util', 'util_model') }}")
    pkg_src = _make_pkg_dir(str(tmp_path), "util")
    tar = _tar(pkg_src, str(tmp_path / "util.tar.gz"))
    with open(os.path.join(proj, "packages.yml"), "w") as f:
        yaml.safe_dump({"packages": [{"tarball": tar}]}, f)

    # before install: from_dir errors with a clear message
    with pytest.raises(ParsingError, match="not installed"):
        ProjectDef.from_dir(proj)

    entries = deps.install(proj)
    assert entries[0]["name"] == "util"
    assert os.path.isdir(os.path.join(proj, "dbt_packages", "util"))
    lock = deps.read_lock(proj)
    assert lock["packages"][0]["tarball"] == tar

    p = ProjectDef.from_dir(proj)
    assert "util" in p.packages
    assert "util_model" in p.packages["util"].models

    # unchanged packages.yml → reinstall is a no-op from the lock pins
    assert deps.install(proj)[0]["name"] == "util"


def test_git_install(tmp_path):
    pkg_src = _make_pkg_dir(str(tmp_path), "gitpkg")
    repo = str(tmp_path / "repo.git")
    subprocess.run(["git", "init", "-q", repo], check=True)
    subprocess.run(["git", "-C", repo, "checkout", "-q", "-b", "main"], check=True)
    for fn in os.listdir(pkg_src):
        subprocess.run(["cp", "-r", os.path.join(pkg_src, fn), repo], check=True)
    env = dict(os.environ, GIT_AUTHOR_NAME="t", GIT_AUTHOR_EMAIL="t@t",
               GIT_COMMITTER_NAME="t", GIT_COMMITTER_EMAIL="t@t")
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True, env=env)
    subprocess.run(["git", "-C", repo, "commit", "-qm", "pkg"], check=True, env=env)

    proj = str(tmp_path / "proj2")
    os.makedirs(proj)
    with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
        yaml.safe_dump({"name": "root2"}, f)
    with open(os.path.join(proj, "packages.yml"), "w") as f:
        yaml.safe_dump({"packages": [{"git": repo, "revision": "main"}]}, f)
    entries = deps.install(proj)
    assert entries[0]["name"] == "gitpkg"
    p = ProjectDef.from_dir(proj)
    assert "gitpkg_model" in p.packages["gitpkg"].models
    # remote URLs error clearly (no network)
    with pytest.raises(ParsingError, match="network"):
        deps._install_git("https://example.com/x.git", proj, None, None)


def test_registry_semver_install(tmp_path):
    registry = str(tmp_path / "registry")
    for ver in ("1.0.0", "1.4.0", "2.0.0"):
        src = _make_pkg_dir(str(tmp_path), "hubpkg", ver,
                            model_sql=f"select '{ver}' as v")
        os.makedirs(os.path.join(registry, "hubpkg"), exist_ok=True)
        _tar(src, os.path.join(registry, "hubpkg", f"{ver}.tar.gz"))

    proj = str(tmp_path / "proj3")
    os.makedirs(proj)
    with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
        yaml.safe_dump({"name": "root3"}, f)
    with open(os.path.join(proj, "packages.yml"), "w") as f:
        yaml.safe_dump({"packages": [
            {"package": "hubpkg", "version": [">=1.0.0", "<2.0.0"]}]}, f)
    entries = deps.install(proj, registry=registry)
    assert entries[0]["version"] == "1.4.0"  # highest satisfying
    with open(os.path.join(
            proj, "dbt_packages", "hubpkg", "models", "hubpkg_model.sql")) as f:
        assert "1.4.0" in f.read()
    # without a registry the hub spec errors with guidance
    os.remove(os.path.join(proj, "package-lock.yml"))
    with pytest.raises(ParsingError, match="registry"):
        deps.install(proj)
