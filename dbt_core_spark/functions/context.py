"""Jinja rendering contexts.

Re-expresses the reference's two-phase context system:

- **BaseContext** functions (ref: core/dbt/context/base.py:187 —
  var :236, env_var :305, fromjson/tojson :375/:396, fromyaml/toyaml
  :419/:450, set/zip :475-537, log :559, run_started_at :591,
  invocation_id :619, modules :631, flags :656, print :674,
  local_md5 :722, dbt_version :216).
- **ProviderContext** (ref: core/dbt/context/providers.py:873 — ref
  :1055, source :1096, config :1104, execute :1161, this, adapter
  :1276, store_result/load_result :941/:920 backing statement()/
  run_query()).

Two resolver modes, exactly like the reference (providers.py:516-668):
parse-time resolvers only *record* refs/sources/config; runtime
resolvers return real relation names (or ``__dbt__cte__*`` for
ephemeral upstreams) and can execute SQL.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import itertools
import json
import os
import re as _re
import threading
import types as _types
import uuid
from collections.abc import Mapping as _Mapping
from typing import TYPE_CHECKING, Any, Optional

import jinja2

from dbt_core_spark.exceptions import CompilationError, ExecutionError
from dbt_core_spark.functions import xdb

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

    from dbt_core_spark.plans.nodes import Manifest, Node

try:
    import yaml as _yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False


class _XdbNamespace:
    """``dbt.*`` cross-database macros inside templates (§2.E)."""

    def __getattr__(self, name: str):
        try:
            return xdb.ALL[name]
        except KeyError:
            raise CompilationError(f"unknown cross-db macro dbt.{name}") from None


class _Exceptions:
    """ref: core/dbt/context/exceptions_jinja.py"""

    @staticmethod
    def raise_compiler_error(msg: str, node: Any = None) -> None:
        raise CompilationError(msg)

    @staticmethod
    def warn(msg: str) -> str:
        print(f"WARNING: {msg}")
        return ""


class _Modules:
    """ref: core/dbt/context/base.py:47-95 — pytz/datetime/re/itertools."""

    datetime = _dt
    re = _re
    itertools = itertools

    def __init__(self) -> None:
        try:  # pragma: no cover
            import pytz

            self.pytz = pytz
        except Exception:
            self.pytz = None


class AgateLikeTable:
    """Minimal result-table for run_query()/statement() macros
    (ref: providers.py:920-959 store_result/load_result; the global
    statement() macro exercised by tests/functional/statements/)."""

    def __init__(self, column_names: list[str], rows: list[tuple]):
        self.column_names = column_names
        self.rows = rows
        self.columns = {
            name: [r[i] for r in rows] for i, name in enumerate(column_names)
        }

    def __iter__(self):
        return iter(self.rows)

    def __len__(self) -> int:
        return len(self.rows)


class RenderContext:
    """One Jinja render environment for a node.

    mode: "parse" (record-only resolvers) or "runtime" (real relations +
    execution) — mirrors providers.py's Parse vs Runtime resolver split.
    """

    RUN_STARTED_AT = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

    def __init__(
        self,
        manifest: "Manifest",
        node: "Node",
        mode: str = "parse",
        spark: Optional["SparkSession"] = None,
        relations: Optional[dict[str, str]] = None,
        cli_vars: Optional[dict[str, Any]] = None,
        is_incremental: bool = False,
        event_time_filter: Optional[tuple[str, str, str]] = None,
        invocation_id: Optional[str] = None,
        run_started_at: Optional[_dt.datetime] = None,
        resolve_limit: Optional[int] = None,
    ):
        self.manifest = manifest
        self.node = node
        self.mode = mode
        self.spark = spark
        self.relations = relations or {}
        self.cli_vars = cli_vars or {}
        self._is_incremental = is_incremental
        self.event_time_filter = event_time_filter  # (col, start_iso, end_iso)
        self.invocation_id = invocation_id or str(uuid.uuid4())
        self.run_started_at = run_started_at or _dt.datetime.now(_dt.timezone.utc)
        # --empty flag: refs/sources read with LIMIT 0 for dry-run schema
        # checks (ref: resolve_limit providers.py:234-236,
        # tests/functional/adapter/basic/test_empty.py)
        self.resolve_limit = resolve_limit
        self.results_store: dict[str, AgateLikeTable] = {}
        self.captured_config: dict[str, Any] = {}
        self.sql_header: Optional[str] = None
        # Ephemeral CTE refs collected DURING this render.  Kept on the
        # context, not the shared Node: concurrent compiles of models
        # sharing an ephemeral upstream (threads>1, concurrent_batches)
        # would otherwise race on node.extra_ctes reset/append/read.
        self.extra_ctes: list[tuple[str, str]] = []

    # --- ref / source (providers.py:516-720) -------------------------------

    def ref(self, *args: str, version: Any = None, v: Any = None) -> str:
        """``ref('name')`` or ``ref('package', 'name')`` — two-arg form
        is package-first, like the reference (RefArgs components.py:38-55)."""
        if len(args) == 2:
            package, name = args
        elif len(args) == 1:
            package, name = None, args[0]
        else:
            raise CompilationError("ref() takes 1 or 2 positional arguments")
        pin = version if version is not None else v
        if pin is not None:
            pin = int(pin)
        target = self.manifest.resolve_ref(
            name, package=package, current=self.node.package, version=pin
        )
        if pin is None and target is not None and target.version is not None:
            # unpinned ref to a versioned model resolves to latest; warn
            # when a newer prerelease exists (ref: UnpinnedRefNewVersionAvailable)
            newer = any(
                n.version is not None and n.name == name
                and n.package == target.package
                and (n.version or 0) > (target.latest_version or 0)
                for n in self.manifest.nodes.values()
            )
            if newer:
                import warnings

                warnings.warn(
                    f"unpinned ref('{name}') resolves to v{target.version}; "
                    f"a newer prerelease version exists — pin with "
                    f"ref('{name}', v=N)",
                    stacklevel=2,
                )
        if self.mode == "parse":
            # two-arg ref('pkg','name') records a (pkg, name) pair
            # (ref: RefArgs components.py:38-55); version pins record the
            # resolved search name so graph edges hit the right node
            recorded = f"{name}.v{pin}" if pin is not None else name
            self.node.refs.append((package, recorded) if package else recorded)
            return f"__ref__{name}__"
        if target is None:
            raise CompilationError(
                f"Model '{self.node.name}' depends on '{name}' which was not found"
            )
        if target.is_ephemeral:
            # ephemeral → CTE inlining (ref: compilation.py:306-396;
            # RuntimeRefResolver.create_relation providers.py:579-586)
            self.extra_ctes.append((target.unique_id, target.cte_name()))
            return target.cte_name()
        rel = self.relations.get(target.unique_id) or target.relation_name
        if rel is None:
            raise CompilationError(f"ref('{name}'): no relation built yet")
        return self._wrap_event_filter(rel, target)

    def source(self, source_name: str, table_name: str) -> str:
        target = self.manifest.resolve_source(source_name, table_name)
        if self.mode == "parse":
            self.node.sources.append((source_name, table_name))
            return f"__source__{source_name}__{table_name}__"
        if target is None:
            raise CompilationError(
                f"Source '{source_name}.{table_name}' not found "
                f"(node '{self.node.name}')"
            )
        rel = self.relations.get(target.unique_id) or target.relation_name
        if rel is None:
            raise CompilationError(f"source('{source_name}','{table_name}') not registered")
        return self._wrap_event_filter(rel, target)

    def _wrap_event_filter(self, rel: str, target: "Node") -> str:
        """Microbatch: push the event-time window into every upstream read
        (ref: providers.py:238-257 — the 100 TB partition-pruning lever)."""
        if self.resolve_limit is not None:
            return f"(select * from {rel} limit {self.resolve_limit})"
        if not self.event_time_filter:
            return rel
        upstream_et = target.config.get("event_time")
        if not upstream_et:
            return rel
        col, start, end = self.event_time_filter
        return (
            f"(select * from {rel} where {upstream_et} >= timestamp'{start}'"
            f" and {upstream_et} < timestamp'{end}')"
        )

    # --- config (providers.py:367-480) --------------------------------------

    def config(self, *args: Any, **kwargs: Any) -> str:
        if self.mode == "parse":
            for k, v in kwargs.items():
                if k == "grants" and "grants" in self.captured_config:
                    # repeated config(grants=...) calls append/clobber
                    # per key rather than replacing the whole dict
                    # (ref: test_grant_configs my_model_extend_twice)
                    from dbt_core_spark.operators.grants import merge_grant_layers

                    self.captured_config["grants"] = merge_grant_layers(
                        self.captured_config["grants"], v)
                else:
                    self.captured_config[k] = v
        return ""

    def config_get(self, key: str, default: Any = None, validator: Any = None) -> Any:
        return self.node.config.get(key, default)

    def config_require(self, key: str) -> Any:
        if key not in self.node.config:
            raise CompilationError(f"config '{key}' required by {self.node.name}")
        return self.node.config[key]

    # --- vars (base.py:139-184) ---------------------------------------------

    def var(self, name: str, default: Any = ...) -> Any:
        for layer in (self.cli_vars, self.manifest.vars):
            if name in layer:
                return layer[name]
        if default is not ...:
            return default
        raise CompilationError(f"Required var '{name}' not found")

    # --- incremental helpers -------------------------------------------------

    def is_incremental(self) -> bool:
        return self._is_incremental

    # --- statement/run_query backing (providers.py:920-992) ------------------

    # dbt macros only ever pull small metadata through run_query(); an
    # unbounded collect() of a user query could OOM the driver at scale,
    # so cap the result and error loudly past it (scale hardening; the
    # reference inherits the same risk via agate).
    RUN_QUERY_MAX_ROWS = 10_000

    def run_query(self, sql: str) -> AgateLikeTable:
        if self.spark is None:
            raise CompilationError("run_query() requires runtime mode")
        df = self.spark.sql(sql)
        cap = self.RUN_QUERY_MAX_ROWS
        rows = [tuple(r) for r in df.limit(cap + 1).collect()]
        if len(rows) > cap:
            raise ExecutionError(
                f"run_query() returned more than {cap} rows — results are "
                f"collected to the driver; aggregate or LIMIT in SQL instead"
            )
        return AgateLikeTable(list(df.columns), rows)

    def store_result(self, name: str, response: Any = None, agate_table: Any = None) -> str:
        self.results_store[name] = agate_table
        return ""

    def _try_or_compiler_error(self, message_if_exception: str, func, *args, **kwargs):
        """ref: providers.py:1018 — run func, re-raise as CompilationError."""
        try:
            return func(*args, **kwargs)
        except Exception:
            raise CompilationError(message_if_exception) from None

    def load_result(self, name: str) -> Optional[AgateLikeTable]:
        return self.results_store.get(name)

    def env_var(self, key: str, default: Any = None) -> Any:
        """``env_var()`` context function; records the observed value so
        the partial-parse cache invalidates when the environment changes
        between invocations (ref: manifest env_vars validity checks)."""
        val = os.environ.get(key)
        self.manifest.used_env_vars[key] = val
        return val if val is not None else default

    # --- context dict ---------------------------------------------------------

    def to_dict(self) -> dict[str, Any]:
        this = self.relations.get(self.node.unique_id) or self.node.relation_name
        cfg = _ConfigWrapper(self)
        ctx: dict[str, Any] = {
            "ref": self.ref,
            "source": self.source,
            "config": cfg,
            "var": self.var,
            "env_var": self.env_var,
            "target": self.manifest.target_context or {
                "name": "dev",
                "type": "spark",
                "schema": (this or "").split(".")[0] if this else "analytics",
                "threads": 4,
            },
            "this": this,
            "execute": self.mode == "runtime",
            "is_incremental": self.is_incremental,
            "run_query": self.run_query,
            "store_result": self.store_result,
            "load_result": self.load_result,
            "exceptions": _Exceptions(),
            "dbt": _XdbNamespace(),
            "dbt_version": "1.9.0-spark",
            "modules": _Modules(),
            "run_started_at": self.run_started_at,
            "invocation_id": self.invocation_id,
            "thread_id": threading.current_thread().name,
            "tojson": lambda v, default=None, sort_keys=False: json.dumps(
                v, sort_keys=sort_keys
            ),
            "fromjson": lambda s, default=None: json.loads(s),
            "toyaml": (lambda v, **kw: _yaml.safe_dump(v)) if _HAVE_YAML else None,
            "fromyaml": (lambda s, **kw: _yaml.safe_load(s)) if _HAVE_YAML else None,
            "set": lambda v, d=None: set(v) if hasattr(v, "__iter__") else d,
            "zip": lambda *a, **kw: list(zip(*a)),
            "log": lambda msg, info=False: print(msg) if info else None,
            "print": print,
            "local_md5": lambda s: hashlib.md5(s.encode()).hexdigest(),
            "flags": {"FULL_REFRESH": False, "WHICH": "run"},
            "diff_of_two_dicts": _diff_of_two_dicts,
            # return(): short-circuit a macro with a (possibly non-string)
            # value (ref: BaseContext.return_ context/base.py:347; the
            # macro-call wrapper in render() catches _MacroReturn)
            "return": _macro_return,
            "set_strict": _set_strict,
            "zip_strict": lambda *a: list(zip(*a, strict=True)),
            "try_or_compiler_error": self._try_or_compiler_error,
            "render": lambda s: render(s, self),
            # selected resources of the current invocation (ref:
            # providers.py:1503; populated by the runner before compile)
            "selected_resources": list(
                getattr(self.manifest, "selected_resources", []) or []
            ),
            "model": {
                "name": self.node.name,
                "unique_id": self.node.unique_id,
                "config": self.node.config,
                "tags": self.node.config.get("tags", []),
            },
            "graph": _LazyGraph(self.manifest),
        }
        if self.spark is not None:
            ctx["adapter"] = SparkAdapterShim(self.spark)
        return ctx


class _LazyGraph(_Mapping):
    """The Jinja ``graph`` context namespace, materialized on first
    access and memoized on the manifest.

    Building per-node summary dicts for EVERY node on EVERY render is
    O(n²) across a parse — on the 2000-model parse benchmark it was
    ~2/3 of total cold-parse time — while almost no model SQL ever
    touches ``graph`` (the reference likewise only exposes a fully
    populated graph at execute time, providers.py ``graph``).  The memo
    is keyed by (len(nodes), len(sources)) so mid-parse additions
    invalidate it."""

    def __init__(self, manifest: Any) -> None:
        self._manifest = manifest

    def _build(self) -> dict[str, Any]:
        m = self._manifest
        key = (len(m.nodes), len(m.sources))
        cached = getattr(m, "_graph_ctx_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        d = {
            "nodes": {
                uid: {"name": n.name, "resource_type": n.resource_type.value,
                      "config": n.config, "tags": n.config.get("tags", [])}
                for uid, n in m.nodes.items()
            },
            "sources": {
                uid: {"name": n.name, "source_name": n.source_name}
                for uid, n in m.sources.items()
            },
        }
        m._graph_ctx_cache = (key, d)
        return d

    def __getitem__(self, k: str) -> Any:
        return self._build()[k]

    def __iter__(self):
        return iter(self._build())

    def __len__(self) -> int:
        return len(self._build())


class _ConfigWrapper:
    """``config(...)`` callable + ``config.get/require`` attribute access
    (ref: providers.py:367-480 Config implementations)."""

    def __init__(self, rc: RenderContext):
        self._rc = rc

    def __call__(self, *args: Any, **kwargs: Any) -> str:
        return self._rc.config(*args, **kwargs)

    def get(self, key: str, default: Any = None, validator: Any = None) -> Any:
        return self._rc.config_get(key, default)

    def require(self, key: str) -> Any:
        return self._rc.config_require(key)


def _diff_of_two_dicts(a: dict, b: dict) -> dict:
    """ref: base.py:693 — keys of a whose values (lists) differ from b."""
    out = {}
    for k, v in a.items():
        diff = [x for x in v if x not in b.get(k, [])]
        if diff:
            out[k] = diff
    return out


class SparkAdapterShim:
    """``adapter.*`` macro surface against spark.catalog
    (ref: BaseDatabaseWrapper providers.py:119; adapter methods used by
    the global-project macros: get_relation, get_columns_in_relation,
    quote, dispatch)."""

    def __init__(self, spark: "SparkSession"):
        self.spark = spark

    def get_relation(self, database: Any, schema: str, identifier: str) -> Optional[str]:
        rel = f"{schema}.{identifier}"
        return rel if self.spark.catalog.tableExists(rel) else None

    def get_columns_in_relation(self, relation: str) -> list[dict]:
        return [
            {"name": f.name, "dtype": f.dataType.simpleString()}
            for f in self.spark.table(relation).schema.fields
        ]

    def quote(self, identifier: str) -> str:
        return f"`{identifier}`"

    def dispatch(self, name: str, macro_namespace: Optional[str] = None):
        fn = xdb.ALL.get(name)
        if fn is None:
            raise CompilationError(f"adapter.dispatch: no macro '{name}'")
        return fn

    def type_string(self) -> str:
        return "string"

    def type_timestamp(self) -> str:
        return "timestamp"


_JINJA_ENV: Optional[jinja2.Environment] = None


def jinja_env() -> jinja2.Environment:
    global _JINJA_ENV
    if _JINJA_ENV is None:
        _JINJA_ENV = jinja2.Environment(
            undefined=jinja2.StrictUndefined,
            extensions=["jinja2.ext.do", "jinja2.ext.loopcontrols"],
        )
    return _JINJA_ENV


_TEST_BLOCK_RE = None


def _preprocess_test_blocks(source: str) -> str:
    """dbt's ``{% test foo(...) %}…{% endtest %}`` compiles to a macro
    named ``test_foo`` (ref: clients/jinja.py materialization/test tag
    handling).  Plain regex rewrite keeps Jinja stock."""
    global _TEST_BLOCK_RE
    if _TEST_BLOCK_RE is None:
        import re as _re_mod

        _TEST_BLOCK_RE = (
            _re_mod.compile(r"{%\s*test\s+(\w+)", _re_mod.IGNORECASE),
            _re_mod.compile(r"{%\s*endtest\s*%}", _re_mod.IGNORECASE),
        )
    head, tail = _TEST_BLOCK_RE
    source = head.sub(lambda m: "{% macro test_" + m.group(1), source)
    return tail.sub("{% endmacro %}", source)


class _MacroReturn(Exception):
    """Raised by the ``return()`` context function to short-circuit a
    macro with a value (ref: MacroReturn dbt_common.exceptions)."""

    def __init__(self, value: Any):
        self.value = value


def _macro_return(value: Any = None) -> Any:
    raise _MacroReturn(value)


def _set_strict(value: Any) -> set:
    """ref: BaseContext.set_strict :495 — TypeError propagates."""
    return set(value)


def _wrap_macro(fn):
    """Catch _MacroReturn so ``{{ return(x) }}`` inside a macro makes the
    macro CALL evaluate to x (dbt's MacroGenerator.call_macro contract —
    dbt_utils-style macros return lists/dicts this way)."""

    def inner(*args: Any, **kwargs: Any):
        try:
            return fn(*args, **kwargs)
        except _MacroReturn as r:
            return r.value

    return inner


# Builtin "global project" macros available in every render, shadowable
# by project macros (locality Core < Imported < Root, ref:
# manifest.py:563-664).  ``statement`` is the call-block form backing
# {% call statement('q', fetch_result=True) %}select …{% endcall %}
# (ref: core macro statement(); tests/functional/statements/).
_BUILTIN_MACRO_SOURCE = """
{% macro statement(name=none, fetch_result=true, auto_begin=true) %}
  {%- set sql = caller() -%}
  {%- set res = run_query(sql) -%}
  {%- if name is not none -%}
    {%- do store_result(name, response='SUCCESS', agate_table=res) -%}
  {%- endif -%}
{% endmacro %}

{% macro noop_statement(name=none, message=none) %}
  {%- set sql = caller() -%}
  {%- if name is not none -%}
    {%- do store_result(name, response=message, agate_table=none) -%}
  {%- endif -%}
{% endmacro %}
"""


# compiled-template cache for MACRO sources (builtin + project/package):
# macro sources repeat identically across every node render, and Jinja
# template compilation dominates parse time — compile once per distinct
# source, re-execute via make_module per render (cheap).  Node templates
# are NOT cached (each renders once per parse).
_MACRO_TMPL_CACHE: dict[str, jinja2.Template] = {}


def _compiled_macro_template(env: jinja2.Environment, src: str) -> jinja2.Template:
    tmpl = _MACRO_TMPL_CACHE.get(src)
    if tmpl is None:
        tmpl = env.from_string(src)
        _MACRO_TMPL_CACHE[src] = tmpl
    return tmpl


def render(template: str, ctx: RenderContext, extra: Optional[dict] = None) -> str:
    """Render a node's Jinja template with the given context, including any
    project macros (ref: MacroGenerator clients/jinja.py:31-113)."""
    env = jinja_env()
    context = ctx.to_dict()
    if extra:
        context.update(extra)
    # project macros: compile each macro source into the same context so
    # models can call them (locality: root package wins — manifest.py:563-664)
    for _mname, msrc in ctx.manifest.macros.items():
        try:
            tmpl = _compiled_macro_template(env, _preprocess_test_blocks(msrc))
            mod = tmpl.make_module(vars=context)
            for attr in dir(mod):
                if not attr.startswith("_") and callable(getattr(mod, attr)):
                    context.setdefault(attr, _wrap_macro(getattr(mod, attr)))
        except Exception as e:  # macro definition errors surface at use time
            raise CompilationError(f"macro '{_mname}' failed to compile: {e}") from e
    # dependency-package macros: exposed package-qualified
    # (``{{ pkg.m() }}``) and bare where the root hasn't taken the name —
    # locality Core < Imported < Root (ref: manifest.py:563-664)
    for _pkg, _macs in ctx.manifest.package_macros.items():
        ns = _types.SimpleNamespace()
        for _mname, msrc in _macs.items():
            try:
                tmpl = _compiled_macro_template(env, _preprocess_test_blocks(msrc))
                mod = tmpl.make_module(vars=context)
                for attr in dir(mod):
                    if not attr.startswith("_") and callable(getattr(mod, attr)):
                        setattr(ns, attr, _wrap_macro(getattr(mod, attr)))
                        context.setdefault(attr, _wrap_macro(getattr(mod, attr)))
            except Exception as e:
                raise CompilationError(
                    f"macro '{_pkg}.{_mname}' failed to compile: {e}"
                ) from e
        context.setdefault(_pkg, ns)
    # builtin "global project" macros LAST (setdefault): any project or
    # package macro of the same name shadows them (Core < Imported < Root)
    _bmod = _compiled_macro_template(env, _BUILTIN_MACRO_SOURCE).make_module(
        vars=context)
    for attr in dir(_bmod):
        if not attr.startswith("_") and callable(getattr(_bmod, attr)):
            context.setdefault(attr, _wrap_macro(getattr(_bmod, attr)))
    try:
        return env.from_string(template).render(**context)
    except jinja2.TemplateError as e:
        raise CompilationError(
            f"Jinja error in {ctx.node.unique_id}: {e}"
        ) from e
