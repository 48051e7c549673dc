"""Per-query source fingerprints for the INCREMENTAL hostile sweep.

The full 230-query x 5-variant perturbation sweep costs ~90 min of gate
time per run (r9 ran it twice). Most rounds change a handful of
modules; a query whose implementing source is bit-identical to the last
full-sweep round cannot have changed behavior against the same hostile
fixtures. This tool fingerprints each catalog query so the sweep can
re-run ONLY the changed ones (full sweep cadence: every other round).

Fingerprint of a query = sha256 over:
- the query function's own source,
- its oracle SQL,
- transitively, the source of every workloads-module helper the
  function references by name (closure over workloads-local
  identifiers),
- the FILE hash of every package module whose imported names the
  closure references (so editing ``operators/versioned.py`` marks every
  ``stage_*`` query changed without any manual mapping),
- module-level plain-data constants referenced by name: strings
  (shared SQL fragments) AND dict/list/tuple/scalar values via a
  canonical JSON dump (canon-column maps, threshold tables — an edit
  to one changes behavior and must re-flag its queries, or the
  "over-approximation only" claim breaks).

Conservative by construction: over-approximation only (a module-file
edit re-sweeps every query touching that module, even for an unrelated
function). Under-approximation would require source the query never
reads changing its behavior — data files and the harness are covered by
the full-sweep cadence.

Usage:
    python tools/perturb_provenance.py write [out.json]
    python tools/perturb_provenance.py changed BASELINE.json
        # prints one query name per line whose fingerprint differs
        # (or which is new); exit 0 always
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_PKG = "cdk_datalake_ingest_upeu_spark"
# function-LOCAL imports (the dominant style in workloads.py: each
# query imports its operators inside the function body)
_IMPORT_RE = re.compile(
    rf"(?:from|import)\s+({_PKG}(?:\.[A-Za-z0-9_]+)*)"
)


def _module_file_hash(mod_name: str, cache: dict) -> str:
    if mod_name in cache:
        return cache[mod_name]
    try:
        import importlib

        mod = importlib.import_module(mod_name)
    except Exception:
        mod = sys.modules.get(mod_name)
    path = getattr(mod, "__file__", None)
    if not path or not os.path.exists(path):
        cache[mod_name] = f"<nofile:{mod_name}>"
        return cache[mod_name]
    with open(path, "rb") as fh:
        cache[mod_name] = hashlib.sha256(fh.read()).hexdigest()
    return cache[mod_name]


def _closure_parts(fn, wl, file_cache: dict) -> list[str]:
    """Deterministic list of source/content parts the query depends on:
    the function's own source, workloads-local helpers (transitively),
    referenced package-module file hashes, and referenced module-level
    string constants."""
    parts: dict[str, str] = {}
    seen: set[str] = set()

    def visit_source(tag: str, src: str) -> None:
        parts[f"src:{tag}"] = src
        for mod_name in set(_IMPORT_RE.findall(src)):
            parts[f"mod:{mod_name}"] = _module_file_hash(
                mod_name, file_cache
            )
        for name in set(_IDENT_RE.findall(src)):
            if name in seen:
                continue
            seen.add(name)
            obj = getattr(wl, name, None)
            if obj is None:
                continue
            mod = getattr(obj, "__module__", None)
            if inspect.isfunction(obj) and mod == wl.__name__:
                try:
                    visit_source(name, inspect.getsource(obj))
                except (OSError, TypeError):
                    parts[f"src:{name}"] = repr(obj)
            elif isinstance(mod, str) and mod.startswith(_PKG):
                parts[f"mod:{mod}"] = _module_file_hash(mod, file_cache)
            elif isinstance(obj, str):
                parts[f"const:{name}"] = obj
            elif isinstance(obj, (dict, list, tuple, int, float, bool)):
                # non-string module-level constants a query reads
                # (canon maps, threshold tables): canonical JSON so an
                # edit re-flags the query. Values that JSON can't
                # serialize deterministically (e.g. a dict holding
                # functions) are skipped — their behavior-bearing parts
                # are covered by the function/module hashes above.
                try:
                    parts[f"const:{name}"] = json.dumps(
                        obj, sort_keys=True
                    )
                except (TypeError, ValueError):
                    pass

    try:
        own = inspect.getsource(fn)
    except (OSError, TypeError):
        own = repr(fn)
    visit_source("__query__", own)
    return [f"{k}\x00{v}" for k, v in sorted(parts.items())]


def fingerprints() -> dict[str, str]:
    from cdk_datalake_ingest_upeu_spark import workloads as wl

    file_cache: dict = {}
    out = {}
    for name, fn in wl.QUERIES.items():
        h = hashlib.sha256()
        h.update((wl.ORACLES.get(name) or "").encode())
        for part in _closure_parts(fn, wl, file_cache):
            h.update(part.encode())
            h.update(b"\x01")
        out[name] = h.hexdigest()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "write"
    fps = fingerprints()
    if mode == "write":
        path = sys.argv[2] if len(sys.argv) > 2 else "PERTURB_PROVENANCE.json"
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(fps, fh, indent=1, sort_keys=True)
        print(f"{len(fps)} fingerprints -> {path}")
    elif mode == "changed":
        with open(sys.argv[2], encoding="utf-8") as fh:
            base = json.load(fh)
        changed = [q for q in sorted(fps) if fps[q] != base.get(q)]
        for q in changed:
            print(q)
        print(
            f"# {len(changed)} changed / {len(fps)} total "
            f"(+{len(set(base) - set(fps))} removed from catalog)",
            file=sys.stderr,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
