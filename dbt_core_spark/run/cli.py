"""Programmatic invoker — the ``dbtRunner().invoke([...])`` analog.

ref: core/dbt/cli/main.py:41-97 (dbtRunner wraps every click command and
returns dbtRunnerResult{success, result, exception}); flag handling
cli/flags.py.  Here the verbs dispatch straight onto Engine methods —
no click layer — but argv-style invocation, flag names, and the result
envelope match, so orchestration code written against dbtRunner ports
by swapping the import.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import SparkSession

from dbt_core_spark.project import ProjectDef


@dataclass
class RunnerResult:
    """dbtRunnerResult analog (ref: cli/main.py:52-60)."""

    success: bool
    result: Any = None
    exception: Optional[BaseException] = None


_BOOL_FLAGS = {"--full-refresh", "--empty", "--favor-state"}


def _parse_args(argv: list[str]) -> tuple[list[str], dict[str, Any]]:
    """Positional words + ``--flag value`` pairs (booleans flagless)."""
    words: list[str] = []
    flags: dict[str, Any] = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            key = a[2:].replace("-", "_")
            if a in _BOOL_FLAGS or i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                flags[key] = True
            else:
                flags[key] = argv[i + 1]
                i += 1
        elif a == "-s":  # --select shorthand
            flags["select"] = argv[i + 1]
            i += 1
        else:
            words.append(a)
        i += 1
    return words, flags


class SparkbtRunner:
    """Invoke engine verbs with dbt-style argv (ref: dbtRunner
    cli/main.py:41-97).  Construct with a live Engine, or with
    (spark, project[, schema]) to build one."""

    def __init__(self, engine=None, spark: Optional[SparkSession] = None,
                 project: Optional[ProjectDef] = None,
                 schema: Optional[str] = None,
                 callbacks: Optional[list] = None):
        from dbt_core_spark.api import Engine

        if engine is None:
            if spark is None or project is None:
                raise ValueError("need an Engine, or spark + project")
            engine = Engine(spark, project, schema=schema, callbacks=callbacks)
        elif callbacks:
            # dbtRunner(callbacks=...) parity on a pre-built Engine
            for cb in callbacks:
                engine.event_manager.add_callback(cb)
        self.engine = engine

    def invoke(self, argv: list[str]) -> RunnerResult:
        import time as _time

        from dbt_core_spark import events as E
        from dbt_core_spark import __version__

        eng = self.engine
        E.reset_invocation_id()
        eng.event_manager.fire(E.main_report_version(__version__))
        _t0 = _time.time()
        res = self._invoke(argv)
        eng.event_manager.fire(E.command_completed(
            " ".join(argv), res.success, _time.time() - _t0))
        return res

    def _invoke(self, argv: list[str]) -> RunnerResult:
        eng = self.engine
        saved_vars = dict(eng.cli_vars)
        try:
            words, flags = _parse_args(argv)
            if not words:
                return RunnerResult(False, exception=ValueError("no command"))
            verb, rest = words[0], words[1:]
            if flags.get("vars"):
                # per-invocation, like the reference's flag handling —
                # restored in the finally; reparse so parse-time var()
                # captures (e.g. in config()) see the new values
                eng.cli_vars.update(json.loads(flags["vars"]))
                eng.reparse()
            sel = dict(
                select=flags.get("select"),
                selector=flags.get("selector"),
            )
            if flags.get("state") and os.path.exists(flags["state"]):
                # --state attaches previous artifacts (manifest.json +
                # run_results.json + sources.json when present) so
                # state:/result:/source_status: selectors and --defer work
                # (ref: --state loading task/base.py).  `clone` passes a
                # schema name instead — the path check skips it.
                state_dir = flags["state"]
                if os.path.exists(os.path.join(state_dir, "manifest.json")):
                    eng.set_state(state_dir)
                if os.path.exists(os.path.join(state_dir, "run_results.json")):
                    eng.set_state(results=state_dir)
                if os.path.exists(os.path.join(state_dir, "sources.json")):
                    eng.set_state(sources=os.path.join(state_dir, "sources.json"))
            defer_kw = dict(
                defer=bool(flags.get("defer")),
                favor_state=bool(flags.get("favor_state")),
                fail_fast=bool(flags.get("fail_fast")),
                warn_error=bool(flags.get("warn_error")),
            )
            if verb == "run":
                res = eng.run(full_refresh=bool(flags.get("full_refresh")),
                              empty=bool(flags.get("empty")),
                              exclude=flags.get("exclude"), **sel, **defer_kw)
                return RunnerResult(res.ok(), res)
            if verb == "seed":
                res = eng.seed(select=flags.get("select"))
                return RunnerResult(res.ok(), res)
            if verb == "snapshot":
                res = eng.snapshot(select=flags.get("select"))
                return RunnerResult(res.ok(), res)
            ind = flags.get("indirect_selection", "eager")
            if verb == "test":
                res = eng.test(indirect_selection=ind, **sel, **defer_kw)
                return RunnerResult(res.ok(), res)
            if verb == "build":
                res = eng.build(full_refresh=bool(flags.get("full_refresh")),
                                indirect_selection=ind, **sel, **defer_kw)
                return RunnerResult(res.ok(), res)
            if verb in ("ls", "list"):
                return RunnerResult(True, eng.ls(
                    select=flags.get("select"), selector=flags.get("selector"),
                    resource_type=flags.get("resource_type"),
                    output=flags.get("output", "selector")))
            if verb == "parse":
                n = eng.reparse()
                return RunnerResult(True, {"reparsed": n,
                                           "nodes": len(eng.manifest.nodes)})
            if verb == "deps":
                return RunnerResult(True, eng.deps())
            if verb == "clean":
                return RunnerResult(True, {"removed": eng.clean()})
            if verb == "compile":
                if flags.get("inline"):
                    return RunnerResult(True, eng.compile_sql(flags["inline"]))
                return RunnerResult(True, eng.compile_analyses())
            if verb == "show":
                if flags.get("inline"):
                    df = eng.show(flags["inline"], limit=int(flags.get("limit", 5)))
                else:
                    df = eng.show_model(flags["select"],
                                        limit=int(flags.get("limit", 5)))
                return RunnerResult(True, df)
            if verb == "docs" and rest[:1] == ["generate"]:
                return RunnerResult(True, eng.docs_generate())
            if verb == "docs" and rest[:1] == ["serve"]:
                # ref: task/docs/serve.py is a static file server over
                # target/ — here we materialize the artifacts it would
                # serve and return the directory (serve with any static
                # server, e.g. `python -m http.server -d <dir>`)
                from dbt_core_spark.run.artifacts import (
                    write_catalog, write_manifest,
                )

                root = eng.project.project_root or "."
                target = os.path.join(root, "target")
                os.makedirs(target, exist_ok=True)
                write_manifest(eng, os.path.join(target, "manifest.json"))
                write_catalog(eng, os.path.join(target, "catalog.json"))
                with open(os.path.join(target, "index.html"), "w") as f:
                    f.write(_DOCS_INDEX_HTML)
                return RunnerResult(True, {
                    "path": target,
                    "note": "static docs site written (index.html + "
                            "manifest/catalog json); serve the directory "
                            "with any file server",
                })
            if verb == "init":
                name = rest[0] if rest else "my_dbt_project"
                root = flags.get("project_dir") or name
                return RunnerResult(True, init_project(root, name))
            if verb == "debug":
                checks = eng.debug()
                return RunnerResult(all(checks.values()), checks)
            if verb == "run-operation":
                args = json.loads(flags.get("args", "{}"))
                return RunnerResult(True, eng.run_operation(rest[0], args))
            if verb == "optimize":
                zo = flags.get("zorder-by")
                return RunnerResult(True, eng.optimize(
                    rest[0],
                    target_file_mb=int(flags.get("target-file-mb", 128)),
                    zorder_by=zo.split(",") if zo else None,
                ))
            if verb == "source" and rest[:1] == ["freshness"]:
                out = eng.source_freshness()
                ok = all(r.status != "error" for r in out.values())
                return RunnerResult(ok, out)
            if verb == "clone":
                return RunnerResult(True, eng.clone(
                    flags["state"], select=flags.get("select")))
            if verb == "retry":
                # ref: task/retry.py — re-run errored/skipped nodes (and
                # only the failed batches of partial-success microbatch
                # nodes) from a written run_results.json
                res = eng.retry(flags["state"])
                return RunnerResult(res.ok(), res)
            return RunnerResult(False,
                                exception=ValueError(f"unknown command {verb!r}"))
        except Exception as e:  # the reference catches and wraps too
            return RunnerResult(False, exception=e)
        finally:
            if eng.cli_vars != saved_vars:
                eng.cli_vars.clear()
                eng.cli_vars.update(saved_vars)
                eng.reparse()


_STARTER_PROJECT_YML = """name: '{name}'
version: '1.0.0'
profile: '{name}'

model-paths: ["models"]
analysis-paths: ["analyses"]
test-paths: ["tests"]
seed-paths: ["seeds"]
macro-paths: ["macros"]
snapshot-paths: ["snapshots"]

clean-targets:
  - "target"
  - "dbt_packages"

models:
  {name}:
    example:
      +materialized: view
"""

_STARTER_MODEL_1 = """/*
    Welcome to your first model!
    Two tiers: a table of generated rows, and a view filtering it.
*/

{{ config(materialized='table') }}

with source_data as (
    select 1 as id
    union all
    select null as id
)

select * from source_data
"""

_STARTER_MODEL_2 = """select * from {{ ref('my_first_dbt_model') }} where id = 1
"""

_STARTER_SCHEMA_YML = """version: 2

models:
  - name: my_first_dbt_model
    description: "A starter dbt model"
    columns:
      - name: id
        tests: [unique]
  - name: my_second_dbt_model
    description: "A starter dbt model"
    columns:
      - name: id
        tests: [unique, not_null]
"""


def init_project(root: str, name: str) -> dict:
    """``dbt init`` analog: scaffold a runnable starter project
    (ref: task/init.py + include/starter_project/ — same layout,
    dbt_project.yml + models/example/{two models, schema.yml}).
    Refuses to overwrite an existing dbt_project.yml."""
    proj_yml = os.path.join(root, "dbt_project.yml")
    if os.path.exists(proj_yml):
        raise FileExistsError(f"{proj_yml} already exists")
    example = os.path.join(root, "models", "example")
    os.makedirs(example, exist_ok=True)
    for d in ("analyses", "tests", "seeds", "macros", "snapshots"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    files = {
        proj_yml: _STARTER_PROJECT_YML.format(name=name),
        os.path.join(example, "my_first_dbt_model.sql"): _STARTER_MODEL_1,
        os.path.join(example, "my_second_dbt_model.sql"): _STARTER_MODEL_2,
        os.path.join(example, "schema.yml"): _STARTER_SCHEMA_YML,
        os.path.join(root, ".gitignore"): "target/\ndbt_packages/\nlogs/\n",
    }
    for path, content in files.items():
        with open(path, "w") as f:
            f.write(content)
    return {"project_dir": root, "name": name, "files": sorted(files)}


# Minimal self-contained docs site (ref: task/docs/serve.py serves the
# dbt-docs SPA; this renders the same manifest.json + catalog.json pair
# with no external assets — node list, searchable, per-node columns/
# stats/compiled SQL).
_DOCS_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>dbt_core_spark docs</title>
<style>
body{font-family:system-ui,sans-serif;margin:0;display:flex;height:100vh}
#nav{width:320px;overflow:auto;border-right:1px solid #ddd;padding:12px}
#main{flex:1;overflow:auto;padding:16px}
#q{width:100%;padding:6px;margin-bottom:8px;box-sizing:border-box}
.node{cursor:pointer;padding:3px 6px;border-radius:4px;font-size:14px}
.node:hover{background:#eef}.rt{color:#888;font-size:11px;margin-left:4px}
table{border-collapse:collapse;margin:8px 0}
td,th{border:1px solid #ccc;padding:4px 8px;font-size:13px;text-align:left}
pre{background:#f6f6f6;padding:10px;overflow:auto;font-size:12px}
h2{margin-top:0}
</style></head><body>
<div id="nav"><input id="q" placeholder="filter nodes..."><div id="list"></div></div>
<div id="main"><h2>dbt_core_spark docs</h2>
<p>Select a node. Data: manifest.json + catalog.json in this directory.</p></div>
<script>
let M={},C={};
async function load(){
  M=await (await fetch('manifest.json')).json();
  try{C=await (await fetch('catalog.json')).json()}catch(e){C={nodes:{}}}
  render('');
  document.getElementById('q').addEventListener('input',e=>render(e.target.value));
}
function nodes(){
  const out=Object.entries(M.nodes||{});
  for(const [k,v] of Object.entries(M.sources||{})) out.push([k,v]);
  return out;
}
function render(filter){
  const el=document.getElementById('list'); el.innerHTML='';
  for(const [uid,n] of nodes()){
    if(filter&&!uid.toLowerCase().includes(filter.toLowerCase()))continue;
    const d=document.createElement('div'); d.className='node';
    d.textContent=n.name||uid;
    const s=document.createElement('span'); s.className='rt';
    s.textContent=n.resource_type||''; d.appendChild(s);
    d.onclick=()=>show(uid,n); el.appendChild(d);
  }
}
function esc(x){const d=document.createElement('div');d.textContent=x==null?'':String(x);return d.innerHTML}
function show(uid,n){
  const cat=(C.nodes||{})[uid]||{};
  let h='<h2>'+esc(n.name||uid)+'</h2>';
  h+='<p><b>'+esc(n.resource_type||'')+'</b> &middot; '+esc(uid)+'</p>';
  if(n.description) h+='<p>'+esc(n.description)+'</p>';
  if(n.config&&n.config.materialized) h+='<p>materialized: <b>'+esc(n.config.materialized)+'</b></p>';
  if(n.depends_on&&n.depends_on.nodes&&n.depends_on.nodes.length)
    h+='<p>depends on: '+n.depends_on.nodes.map(esc).join(', ')+'</p>';
  const cols=cat.columns||n.columns||{};
  if(Object.keys(cols).length){
    h+='<table><tr><th>column</th><th>type</th><th>comment</th></tr>';
    for(const [c,info] of Object.entries(cols))
      h+='<tr><td>'+esc(c)+'</td><td>'+esc(info.type||info.data_type||'')+
         '</td><td>'+esc(info.comment||info.description||'')+'</td></tr>';
    h+='</table>';
  }
  if(cat.stats) h+='<pre>'+esc(JSON.stringify(cat.stats,null,2))+'</pre>';
  const sql=n.compiled_code||n.raw_code||n.raw_sql;
  if(sql) h+='<h3>SQL</h3><pre>'+esc(sql)+'</pre>';
  document.getElementById('main').innerHTML=h;
}
load();
</script></body></html>
"""
