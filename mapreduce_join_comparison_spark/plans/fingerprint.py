"""Per-query source fingerprints — the staleness signal behind the
driver-check ordering.

The grading driver verifies ~50 queries per round in registration
order, so which queries LEAD the registry decides which get a fresh
hard CORRECTNESS row. A query whose code (or whose operators' code, or
whose oracle SQL) changed since its last driver-green check must be
re-proved before an untouched green is re-proved; a query never checked
must lead everything. This module computes, for every registered query
key, a content hash of exactly the source that determines its result:

  * the top-level function enclosing the registered callable (AST
    source segment — NOT the whole catalog module, so editing one
    query does not mark the other 129 stale),
  * top-level helpers/constants of the same module that the function
    references by name (one level — catches ``_load``-style helpers),
  * the oracle SQL string registered for the key,
  * the FULL source of every package module the function (or its
    helpers) imports, transitively through the package import graph
    (an edit to ``operators/joins.py`` marks every join query stale;
    an edit to ``sources/io.py`` marks everything that loads a table).

The committed manifest ``FINGERPRINTS.json`` (repo root) records the
fingerprint each key had at its most recent driver-green round; a
mismatch vs the current tree = stale. ``tools/update_fingerprints.py``
rebuilds the manifest from the CORRECTNESS_r*.json history by
recomputing fingerprints at each round's graded commit.

Fingerprints are a PRIORITIZATION heuristic, not a correctness gate —
the local oracle-parity pytest replica checks all queries every run
regardless. A missed dependency here mis-orders a check, it cannot
hide a wrong answer.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import sys
from collections.abc import Callable, Mapping


# --------------------------------------------------------------------------
# Module-level parsing (cached per file)
# --------------------------------------------------------------------------

class _ModuleInfo:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.raw = f.read()
        self.src = self.raw.decode("utf-8")
        self.tree = ast.parse(self.src)
        # split ONCE — ast.get_source_segment re-splits the whole file
        # per call, which is quadratic over a 4k-line catalog
        lines = self.src.splitlines(keepends=True)

        def _seg(node: ast.AST) -> str | None:
            lo, hi = node.lineno - 1, node.end_lineno - 1
            if lo == hi:
                return lines[lo][node.col_offset:node.end_col_offset]
            chunk = [lines[lo][node.col_offset:]]
            chunk.extend(lines[lo + 1: hi])
            chunk.append(lines[hi][: node.end_col_offset])
            return "".join(chunk)

        # top-level name -> source segment (defs, classes, assignments)
        self.segments: dict[str, str] = {}
        for node in self.tree.body:
            seg = _seg(node)
            if seg is None:
                continue
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.segments[node.name] = seg
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        self.segments[tgt.id] = seg
            elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name
            ):
                self.segments[node.target.id] = seg


_MOD_CACHE: dict[str, _ModuleInfo] = {}


def _module_info(path: str) -> _ModuleInfo:
    path = os.path.abspath(path)
    info = _MOD_CACHE.get(path)
    if info is None:
        info = _MOD_CACHE[path] = _ModuleInfo(path)
    return info


def clear_cache() -> None:
    _MOD_CACHE.clear()
    _MOD_DEPS_CACHE.clear()


# --------------------------------------------------------------------------
# Package import graph
# --------------------------------------------------------------------------

def _resolve_imports(
    tree: ast.AST, package: str, pkg: str
) -> set[str]:
    """Package-internal module names imported anywhere under ``tree``
    (module body AND inside function bodies), resolved per Python's
    relative-import rules against ``package`` — the ``__package__``
    value, i.e. the module's parent package for a plain module, the
    package itself for an ``__init__``."""
    parts = package.split(".")
    deps: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level > 0:
                # one dot = the containing package; each extra dot
                # walks one level up
                base = parts[: len(parts) - (node.level - 1)]
                if not base or base[0] != pkg.split(".")[0]:
                    continue
                target = ".".join(base + (node.module or "").split("."))
                target = target.rstrip(".")
            elif node.module and node.module.startswith(pkg + "."):
                target = node.module
            elif node.module == pkg:
                target = pkg
            else:
                continue
            deps.add(target)
            # `from . import pipeline` / `from .sources import layout`
            # name SUBMODULES via the alias — add the candidates too;
            # _closure drops any that don't resolve to a file. For
            # `from .sources import load_table` (a re-exported symbol)
            # the package __init__ is the dep and its own imports carry
            # the closure to the submodule.
            for alias in node.names:
                deps.add(target + "." + alias.name)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name == pkg or alias.name.startswith(pkg + "."):
                    deps.add(alias.name)
    return deps


def _mod_path(modname: str, pkg: str, pkg_dir: str) -> str | None:
    """File for a package-internal module name, or None."""
    rel = modname.split(".")[1:]  # strip the package root name
    base = os.path.join(pkg_dir, *rel) if rel else pkg_dir
    if os.path.isdir(base):
        init = os.path.join(base, "__init__.py")
        return init if os.path.isfile(init) else None
    py = base + ".py"
    return py if os.path.isfile(py) else None


_MOD_DEPS_CACHE: dict[str, set[str]] = {}


def _package_of(path: str, pkg: str, pkg_dir: str) -> str:
    """The ``__package__`` value for the module at ``path``."""
    modname = _path_modname(path, pkg, pkg_dir)
    if os.path.basename(path) == "__init__.py":
        return modname
    return modname.rsplit(".", 1)[0] if "." in modname else pkg


def _module_deps(path: str, pkg: str, pkg_dir: str) -> set[str]:
    deps = _MOD_DEPS_CACHE.get(path)
    if deps is None:
        info = _module_info(path)
        deps = _resolve_imports(
            info.tree, _package_of(path, pkg, pkg_dir), pkg
        )
        _MOD_DEPS_CACHE[path] = deps
    return deps


def _closure(
    roots: set[str], pkg: str, pkg_dir: str
) -> dict[str, str]:
    """Transitive closure of package-internal deps: modname -> path."""
    out: dict[str, str] = {}
    todo = list(roots)
    while todo:
        m = todo.pop()
        if m in out:
            continue
        path = _mod_path(m, pkg, pkg_dir)
        if path is None:
            continue
        out[m] = path
        for d in _module_deps(path, pkg, pkg_dir):
            if d not in out:
                todo.append(d)
    return out


def _path_modname(path: str, pkg: str, pkg_dir: str) -> str:
    rel = os.path.relpath(os.path.abspath(path), os.path.abspath(pkg_dir))
    rel = rel[:-3] if rel.endswith(".py") else rel
    parts = [p for p in rel.split(os.sep) if p not in (".", "__init__")]
    return ".".join([pkg] + parts) if parts else pkg


# --------------------------------------------------------------------------
# Per-query fingerprint
# --------------------------------------------------------------------------

def _segment_names(seg: str) -> set[str]:
    try:
        tree = ast.parse(seg)
    except SyntaxError:
        return set()
    return {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}


def compute_fingerprints(
    queries: Mapping[str, Callable],
    oracles: Mapping[str, str],
    *,
    narrow: bool = False,
) -> dict[str, str]:
    """key -> sha256 hex of everything its result depends on. Pure
    file-reading + AST; never touches Spark. The tree hashed is
    whichever tree the callables were imported from, so running this
    inside an old git worktree fingerprints that round's code.

    ``narrow=True`` hashes only the DIRECT source of the query — its
    function segment, same-module helpers, oracle SQL, and the files
    of modules the segment imports by name — skipping the transitive
    closure. The pair (full, narrow) splits "stale" into "this query's
    own code/operators changed" vs "only a shared dependency deeper in
    the import graph changed": an edit to ``sources/io.py`` marks all
    201 keys full-stale (every query loads tables), and without the
    narrow tier the driver's ~50-key window would fill with
    oldest-green keys instead of the ones whose semantics actually
    moved."""
    fps: dict[str, str] = {}
    for key, fn in queries.items():
        mod = sys.modules.get(fn.__module__)
        if mod is None or not getattr(mod, "__file__", None):
            fps[key] = "unresolved:" + fn.__module__
            continue
        path = mod.__file__
        pkg = fn.__module__.split(".")[0]
        pkg_dir = os.path.dirname(
            sys.modules[pkg].__file__
        )
        info = _module_info(path)
        top = fn.__qualname__.split(".")[0]
        seg = info.segments.get(top)
        pieces: list[bytes] = []
        if seg is None:
            # can't isolate the def (exotic registration) — fall back
            # to the whole module, coarse but never silently fresh
            pieces.append(info.raw)
            seg_all = info.src
        else:
            pieces.append(seg.encode())
            # one level of same-module helpers referenced by name
            helper_srcs = []
            for name in sorted(_segment_names(seg)):
                if name != top and name in info.segments:
                    helper_srcs.append(info.segments[name])
            for h in helper_srcs:
                pieces.append(h.encode())
            seg_all = "\n".join([seg] + helper_srcs)
        pieces.append((oracles.get(key) or "").encode())
        # imports inside the segment(s) -> transitive package closure
        try:
            seg_tree = ast.parse(seg_all)
        except SyntaxError:
            seg_tree = info.tree
        direct = _resolve_imports(
            seg_tree, _package_of(path, pkg, pkg_dir), pkg
        )
        if narrow:
            deps = {
                m: p
                for m in direct
                if (p := _mod_path(m, pkg, pkg_dir)) is not None
            }
        else:
            deps = _closure(direct, pkg, pkg_dir)
        for depname, deppath in sorted(deps.items()):
            pieces.append(depname.encode())
            pieces.append(_module_info(deppath).raw)
        h = hashlib.sha256()
        for p in pieces:
            h.update(p)
            h.update(b"\x00")
        fps[key] = h.hexdigest()
    return fps


# --------------------------------------------------------------------------
# Manifest
# --------------------------------------------------------------------------

MANIFEST_NAME = "FINGERPRINTS.json"

# Keys to LEAD the next driver window regardless of green-age — the
# per-round "front-load changed keys" directive: the keys whose
# SEMANTICS (not just shared imports) the current round's edits
# touched, so the very next driver window re-proves them first.
#
# Two expiry mechanisms (round-8 advice: an unmaintained pin list must
# not silently bias future rounds' windows):
#   * a pinned key jumps the queue only while it is STALE — once
#     re-proven green with unchanged source it sorts normally;
#   * the whole list is tagged with the round that wrote it
#     (FRONTLOAD_ROUND) and is dropped MECHANICALLY once the manifest
#     contains a green from that round or later — i.e. the driver
#     window the pins were aimed at has already run.
FRONTLOAD_ROUND = 11
FRONTLOAD: tuple[str, ...] = (
    # round-11 semantic-surface changes (output hashes proven
    # identical locally at all three scales; plans structurally
    # identical modulo generated lambda names — but these are the
    # keys whose expression construction or eager-probe shape this
    # round's optimization edits touched, so the driver re-proves
    # them first):
    # — dot/norm/cosine + PQ codebook folds rebuilt as parsed SQL,
    #   session expression-parse cache (operators/similarity.py)
    "similarity_bruteforce_topk",
    "similarity_projected_rerank",
    "similarity_ivf_ann",
    "similarity_ivfpq_ann",
    "similarity_lsh_ann",
    "similarity_truncation_recall",
    "similarity_hybrid_rrf",
    "embedding_random_projection",
    "embedding_pq_codes",
    "embedding_topic_tag",
    "embedding_kmeans",
    "dedup_embedding_cosine",
    "dedup_semdedup_cells",
    # — build_prefix_index: prove-before-write + 3-way write overlap
    "dedup_prefix_filter_indexed",
    "dedup_prefix_filter_delta",
    # — per-side probe fusion (tier collect / bounds aggregates)
    "join_interval_overlap",
    "join_theta_iejoin",
    "join_theta_iejoin_quantile",
    # — BPE fan_out revert (round-10's spread measured a local
    #   regression; interleaved A/B in OPTIMIZATION_r11.md)
    "pipeline_bpe_vocab",
    "pipeline_bpe_encode",
    # — pagerank localCheckpoint (headline plan unchanged at 3
    #   iterations; re-prove anyway, the loop body changed)
    "graph_pagerank",
)


def manifest_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        ))),
        MANIFEST_NAME,
    )


def load_manifest() -> dict[str, dict]:
    """{key: {"fp": hex, "round": N}} for each key's latest
    driver-green check; {} when the manifest doesn't exist yet."""
    try:
        with open(manifest_path()) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def derive_priority(
    queries: Mapping[str, Callable],
    oracles: Mapping[str, str],
) -> list[str]:
    """Driver-check ordering over ALL registered keys:

      1. never driver-green (not in the manifest) — registration order;
      2. direct-stale (the query's NARROW fingerprint — own function,
         helpers, oracle SQL, directly-imported modules — moved since
         its last green; or the manifest predates narrow fingerprints)
         — oldest last-green round first, then registration order;
      3. transitive-stale (narrow unchanged but the full closure
         fingerprint moved: a shared dependency like ``sources/io.py``
         changed) — same sort;
      4. fresh greens — oldest last-green round first (rotating
         re-verification), then registration order.

    The 2/3 split exists because a shared-module edit marks EVERY key
    full-stale at once; semantically-changed keys must still fit in
    the driver's ~50-key window.

    Any failure (unreadable manifest, AST surprise) returns [] so the
    driver still sees plain registration order rather than an import
    crash."""
    manifest = load_manifest()
    if not manifest:
        return []
    current = compute_fingerprints(queries, oracles)
    current_narrow = compute_fingerprints(queries, oracles, narrow=True)
    reg_pos = {k: i for i, k in enumerate(queries)}
    never, stale_direct, stale_trans, fresh = [], [], [], []
    for k in queries:
        rec = manifest.get(k)
        if rec is None:
            never.append(k)
        elif rec.get("fp") != current.get(k):
            nfp = rec.get("nfp")
            if nfp is None or nfp != current_narrow.get(k):
                stale_direct.append(k)
            else:
                stale_trans.append(k)
        else:
            fresh.append(k)
    by_age = lambda k: (manifest[k].get("round", 0), reg_pos[k])  # noqa: E731
    stale_direct.sort(key=by_age)
    stale_trans.sort(key=by_age)
    fresh.sort(key=by_age)
    # pins lead the checked block (see FRONTLOAD). Expiry is PER KEY
    # (round-9 review: an any-key round-N green expired the whole
    # list, so a partial driver window — e.g. one that only reached
    # the never-green keys before its budget — permanently demoted
    # pins that were never re-proven): a pin holds while THAT key's
    # last green predates FRONTLOAD_ROUND; once the key has a
    # round-(FRONTLOAD_ROUND)+ green, the window the pin was aimed at
    # has covered it and the pin expires mechanically (round-8 advice:
    # mechanical expiry over maintenance). Round 10 dropped the
    # stale-only gate: a pin may also target a FRESH key whose last
    # green is simply old (verdict directive #6 — generator_uniform's
    # fingerprint hadn't moved since round 2, so the stale gate kept
    # a five-round-old check from ever re-entering a window that ~119
    # shared-module-stale keys saturate); the per-key round expiry
    # still retires it after its aimed window runs.
    stale_all = stale_direct + stale_trans
    pinned = [
        k for k in FRONTLOAD
        if k in reg_pos and k not in set(never)
        and manifest.get(k, {}).get("round", 0) < FRONTLOAD_ROUND
    ]
    pinset = set(pinned)
    rest = [k for k in stale_all if k not in pinset]
    fresh = [k for k in fresh if k not in pinset]
    return never + pinned + rest + fresh
