"""Automated API-parity audit against the reference package.

Walks every module of /root/reference/graph_kmer_index with ``ast``
(no import — the reference has unresolvable deps and one module with a
SyntaxError), enumerates the public top-level classes/functions and the
CLI subcommands, and asserts each one maps to a live symbol here or to
an explicitly documented omission. This mechanizes PARITY.md: a new
public symbol appearing in the reference, or a renamed/removed symbol
here, fails the suite instead of silently drifting.
"""
import ast
import importlib
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference/graph_kmer_index")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference checkout not present")

# reference "module.symbol" -> our "module:attr", or ("omitted", reason).
# Renames are deliberate TPU-design choices; PARITY.md carries the prose.
MAPPING = {
    "bionumpy_wrapper.bionumpy_hash":
        "graph_kmer_index_tpu.bionumpy_wrapper:bionumpy_hash",
    "collision_free_kmer_index.CounterKmerIndex":
        "graph_kmer_index_tpu.models.kmer_index:CounterKmerIndex",
    "collision_free_kmer_index.MinimalKmerIndex":
        "graph_kmer_index_tpu.models.kmer_index:MinimalKmerIndex",
    "collision_free_kmer_index.KmerIndex2":
        "graph_kmer_index_tpu.models.kmer_index:KmerIndex2",
    "collision_free_kmer_index.CollisionFreeKmerIndex":
        "graph_kmer_index_tpu.models.kmer_index:CollisionFreeKmerIndex",
    "command_line_interface.main": "graph_kmer_index_tpu.cli:main",
    "command_line_interface.run_argument_parser":
        "graph_kmer_index_tpu.cli:run_argument_parser",
    "command_line_interface.create_index_single_thread":
        "graph_kmer_index_tpu.cli:create_index_single_thread",
    "command_line_interface.create_index":
        "graph_kmer_index_tpu.cli:create_index",
    "command_line_interface.make_from_flat":
        "graph_kmer_index_tpu.cli:make_from_flat",
    "command_line_interface.make_reverse":
        "graph_kmer_index_tpu.cli:make_reverse",
    "command_line_interface.make_reference_kmer_index":
        "graph_kmer_index_tpu.cli:make_reference_kmer_index",
    "command_line_interface.make_unique_index":
        "graph_kmer_index_tpu.cli:make_unique_index",
    "command_line_interface.prune_flat_kmers":
        "graph_kmer_index_tpu.cli:prune_flat_kmers",
    "count_min_sketch_kmer_counter.CountMinSketchKmerCounter":
        "graph_kmer_index_tpu.models.counters:CountMinSketchKmerCounter",
    "critical_graph_paths.CriticalGraphPaths":
        "graph_kmer_index_tpu.critical_paths:CriticalGraphPaths",
    "flat_kmers.FlatKmers": "graph_kmer_index_tpu.flat_kmers:FlatKmers",
    "flat_kmers.FlatKmers2": "graph_kmer_index_tpu.flat_kmers:FlatKmers2",
    "flat_kmers.letter_sequence_to_numeric":
        "graph_kmer_index_tpu.hashing:letter_sequence_to_numeric",
    "flat_kmers.numeric_to_letter_sequence":
        "graph_kmer_index_tpu.hashing:numeric_to_letter_sequence",
    "indel_kmer_finder.IndelKmerFinder":
        "graph_kmer_index_tpu.snp_finder:IndelKmerFinder",
    "index_bundle.IndexBundle":
        "graph_kmer_index_tpu.models.bundle:IndexBundle",
    "kmer_counter.choose_modulo":
        "graph_kmer_index_tpu.models.counters:choose_modulo",
    "kmer_counter.KmerCounter":
        "graph_kmer_index_tpu.models.counters:KmerCounter",
    "kmer_finder.update_hash": "graph_kmer_index_tpu.hashing:update_hash",
    "kmer_finder.DenseKmerFinder":
        "graph_kmer_index_tpu.finder:DenseKmerFinder",
    "kmer_frequency_index.KmerFrequencyIndex":
        "graph_kmer_index_tpu.models.counters:KmerFrequencyIndex",
    "kmer_hashing.power_array": "graph_kmer_index_tpu.hashing:power_array",
    "kmer_hashing.reverse_power_array":
        "graph_kmer_index_tpu.hashing:reverse_power_array",
    "kmer_hashing.kmer_hash_to_reverse_complement_hash":
        "graph_kmer_index_tpu.hashing:kmer_hash_to_reverse_complement_hash",
    "kmer_hashing.kmer_hashes_to_reverse_complement_hash_chunked":
        "graph_kmer_index_tpu.hashing:"
        "kmer_hashes_to_reverse_complement_hash_chunked",
    "kmer_hashing.kmer_hashes_to_reverse_complement_hash":
        "graph_kmer_index_tpu.hashing:kmer_hashes_to_reverse_complement_hash",
    "kmer_hashing.kmer_hashes_to_complement_hashes":
        "graph_kmer_index_tpu.hashing:kmer_hashes_to_complement_hashes",
    "kmer_hashing.kmer_hashes_to_complement_bases":
        "graph_kmer_index_tpu.hashing:kmer_hashes_to_complement_bases",
    "kmer_hashing.kmer_hashes_to_bases":
        "graph_kmer_index_tpu.hashing:kmer_hashes_to_bases",
    "logn_hash_map.BaseHashMap":
        "graph_kmer_index_tpu.containers:BaseHashMap",
    "logn_hash_map.ModuloHashMap":
        "graph_kmer_index_tpu.containers:ModuloHashMap",
    "logn_hash_map.LogNHashMap":
        "graph_kmer_index_tpu.containers:LogNHashMap",
    "multi_value_hashtable.MultiValueHashTable":
        "graph_kmer_index_tpu.containers:MultiValueHashTable",
    "nplist.NpList": "graph_kmer_index_tpu.containers:NpList",
    "npset.NpSet": "graph_kmer_index_tpu.containers:NpSet",
    "read_kmers.ReadKmers": "graph_kmer_index_tpu.read_kmers:ReadKmers",
    "reference_kmer_index.fill_zeros_from_end":
        "graph_kmer_index_tpu.models.reference_index:fill_zeros_from_end",
    "reference_kmer_index.ReferenceKmerIndex":
        "graph_kmer_index_tpu.models.reference_index:ReferenceKmerIndex",
    "reverse_kmer_index.ReverseKmerIndex":
        "graph_kmer_index_tpu.models.reverse_index:ReverseKmerIndex",
    # shared-memory object store -> HBM residency registry + fork pool
    # (parallel/, PARITY.md L7); renamed on purpose: the residency is
    # device memory, not POSIX shm
    "shared_mem.SingleSharedArray":
        "graph_kmer_index_tpu.parallel.device_store:SingleSharedArray",
    "shared_mem.get_shared_pool":
        "graph_kmer_index_tpu.parallel.host_pool:get_shared_pool",
    "shared_mem.close_shared_pool":
        "graph_kmer_index_tpu.parallel.host_pool:close_shared_pool",
    "shared_mem.to_shared_memory":
        "graph_kmer_index_tpu.parallel.device_store:to_device_memory",
    "shared_mem.from_shared_memory":
        "graph_kmer_index_tpu.parallel.device_store:from_device_memory",
    "shared_mem.remove_shared_memory":
        "graph_kmer_index_tpu.parallel.device_store:free",
    "shared_mem.remove_shared_memory_in_session":
        "graph_kmer_index_tpu.parallel.device_store:free_all",
    "shared_mem.remove_all_shared_memory":
        "graph_kmer_index_tpu.parallel.device_store:free_all",
    "shared_mem.run_numpy_based_function_in_parallel":
        "graph_kmer_index_tpu.parallel.sharded:run_sharded_function",
    "snp_kmer_finder.kmer_hash_to_sequence":
        "graph_kmer_index_tpu.hashing:kmer_hash_to_sequence",
    "snp_kmer_finder.sequence_to_kmer_hash":
        "graph_kmer_index_tpu.hashing:sequence_to_kmer_hash",
    "snp_kmer_finder.kmer_to_hash_fast":
        "graph_kmer_index_tpu.hashing:kmer_to_hash_fast",
    "snp_kmer_finder.SnpKmerFinder":
        "graph_kmer_index_tpu.snp_finder:SnpKmerFinder",
    "structural_variants.sample_kmers_from_structural_variants":
        "graph_kmer_index_tpu.structural_variants:"
        "sample_kmers_from_structural_variants",
    "unique_kmer_index.UniqueKmerIndex":
        "graph_kmer_index_tpu.models.unique_index:UniqueKmerIndex",
    "unique_variant_kmers.UniqueVariantKmersFinder":
        "graph_kmer_index_tpu.unique_variant_kmers:UniqueVariantKmersFinder",
}

# whole modules that fail to parse upstream (dead code) are omitted as
# a unit; PARITY.md documents each
OMITTED_MODULES = {
    "variant_nodes_index": "dead code upstream: SyntaxError if imported "
                           "(variant_nodes_index.py:13-16)",
}


def _ref_public_symbols():
    """[(module, symbol)] for every public top-level class/function in
    the reference package; (module, None) for unparseable modules."""
    out = []
    for f in sorted(REF.glob("*.py")):
        if f.stem == "__init__":
            continue
        try:
            tree = ast.parse(f.read_text())
        except SyntaxError:
            out.append((f.stem, None))
            continue
        for n in tree.body:
            if (isinstance(n, (ast.ClassDef, ast.FunctionDef,
                               ast.AsyncFunctionDef))
                    and not n.name.startswith("_")):
                out.append((f.stem, n.name))
    return out


def test_every_reference_symbol_is_mapped():
    unmapped = []
    for mod, sym in _ref_public_symbols():
        if sym is None:
            if mod not in OMITTED_MODULES:
                unmapped.append(f"{mod} (unparseable, undocumented)")
            continue
        if f"{mod}.{sym}" not in MAPPING:
            unmapped.append(f"{mod}.{sym}")
    assert not unmapped, (
        "reference public symbols with no parity mapping: "
        f"{unmapped} — implement an equivalent (or document the "
        "omission here and in PARITY.md)")


def test_mapped_targets_resolve():
    broken = []
    for key, target in sorted(MAPPING.items()):
        mod_name, attr = target.split(":")
        try:
            mod = importlib.import_module(mod_name)
        except Exception as e:  # pragma: no cover - import failure detail
            broken.append(f"{key} -> {target} (import failed: {e})")
            continue
        if not hasattr(mod, attr):
            broken.append(f"{key} -> {target} (missing attribute)")
    assert not broken, f"parity mapping points at dead symbols: {broken}"


def _subcommands_from_source(path):
    """Subcommand names string-registered via add_parser(...) in a CLI
    source file (the reference registers all of its statically)."""
    names = set()
    tree = ast.parse(path.read_text())
    for n in ast.walk(tree):
        if (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
                and n.func.attr == "add_parser" and n.args
                and isinstance(n.args[0], ast.Constant)
                and isinstance(n.args[0].value, str)):
            names.add(n.args[0].value)
    return names


def test_cli_subcommand_superset():
    """Every reference CLI subcommand exists here (ours registers some
    dynamically, so our side is introspected from the built parser)."""
    ref_cmds = _subcommands_from_source(
        REF / "command_line_interface.py")
    assert len(ref_cmds) >= 18  # sanity: the documented surface
    from graph_kmer_index_tpu.cli import build_argument_parser
    parser = build_argument_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    ours = set(sub.choices)
    missing = ref_cmds - ours
    assert not missing, f"reference CLI subcommands missing here: {missing}"


def test_cli_flag_superset():
    """Every flag of every reference CLI subcommand exists on our
    subcommand too (reference add_argument calls attributed to their
    subparser by a line-order sweep; the reference reuses one variable
    name for all subparsers)."""
    import ast

    src = (REF / "command_line_interface.py").read_text()
    tree = ast.parse(src)
    events = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call):
            c = node.value
            if (isinstance(c.func, ast.Attribute)
                    and c.func.attr == "add_parser" and c.args
                    and isinstance(c.args[0], ast.Constant)
                    and node.targets
                    and isinstance(node.targets[0], ast.Name)):
                events.append((node.lineno, "parser", node.targets[0].id,
                               c.args[0].value))
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"
                and isinstance(node.func.value, ast.Name)):
            flags = [a.value for a in node.args
                     if isinstance(a, ast.Constant)]
            if flags:
                events.append((node.lineno, "arg", node.func.value.id,
                               tuple(flags)))
    events.sort()
    ref_flags, cur = {}, {}
    for _ln, kind, var, val in events:
        if kind == "parser":
            cur[var] = val
            ref_flags.setdefault(val, set())
        elif var in cur:
            ref_flags[cur[var]].add(val)
    assert sum(len(v) for v in ref_flags.values()) >= 100  # sanity

    from graph_kmer_index_tpu.cli import build_argument_parser
    parser = build_argument_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    missing = []
    for cmd, flagsets in ref_flags.items():
        ours = {s for a in sub.choices[cmd]._actions
                for s in a.option_strings}
        for flags in flagsets:
            if not (set(flags) & ours):
                missing.append((cmd, flags))
    assert not missing, f"reference CLI flags missing here: {missing}"


def test_cli_flag_defaults_match():
    """Every reference flag default (literal `default=` values from the
    reference argparse source) matches our built parser's default —
    pins the magic numbers (modulo 452930477, chunk-size 10000,
    max-variant-nodes 5/6, genome-size 3e9, ...)."""
    import ast

    src = (REF / "command_line_interface.py").read_text()
    tree = ast.parse(src)
    events = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and isinstance(node.value, ast.Call):
            c = node.value
            if (isinstance(c.func, ast.Attribute)
                    and c.func.attr == "add_parser" and c.args
                    and isinstance(c.args[0], ast.Constant)
                    and node.targets
                    and isinstance(node.targets[0], ast.Name)):
                events.append((node.lineno, "parser", node.targets[0].id,
                               c.args[0].value, None))
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"
                and isinstance(node.func.value, ast.Name)):
            flags = tuple(a.value for a in node.args
                          if isinstance(a, ast.Constant))
            dflt = None
            for kw in node.keywords:
                if kw.arg == "default":
                    try:
                        dflt = ast.literal_eval(kw.value)
                    except Exception:
                        dflt = None  # non-literal: skip comparison
            if flags:
                events.append((node.lineno, "arg", node.func.value.id,
                               flags, dflt))
    events.sort()
    ref_defaults, cur = {}, {}
    for _ln, kind, var, val, dflt in events:
        if kind == "parser":
            cur[var] = val
            ref_defaults.setdefault(val, {})
        elif var in cur:
            ref_defaults[cur[var]][val] = dflt

    from graph_kmer_index_tpu.cli import build_argument_parser
    parser = build_argument_parser()
    sub = next(a for a in parser._actions
               if isinstance(a, type(parser._subparsers._group_actions[0])))
    diffs = []
    for cmd, flags in ref_defaults.items():
        byflag = {s: a for a in sub.choices[cmd]._actions
                  for s in a.option_strings}
        for fl, d in flags.items():
            a = next((byflag[f] for f in fl if f in byflag), None)
            if a is None:
                continue  # absence is test_cli_flag_superset's job
            if d is None and a.default in (None, False):
                continue  # unset vs store_true-default-False: equivalent
            if d != a.default:
                diffs.append((cmd, fl, d, a.default))
    assert not diffs, f"CLI default divergences: {diffs}"


def test_core_signatures_superset():
    """Every parameter of the reference's core public methods exists on
    ours (callers porting from the reference never hit a TypeError).
    Uses the in-process reference loader (benchmarks/reference_harness)."""
    import inspect
    import pathlib as _pl
    import sys as _sys
    _sys.path.insert(0, str(
        _pl.Path(__file__).resolve().parents[1] / "benchmarks"))
    from reference_harness import load_reference
    ref = load_reference()

    import graph_kmer_index_tpu as gki
    from graph_kmer_index_tpu import flat_kmers as our_fk
    from graph_kmer_index_tpu import unique_variant_kmers as our_uvk
    from graph_kmer_index_tpu.models import kmer_index as our_ki

    pairs = [
        (ref.DenseKmerFinder.__init__, gki.DenseKmerFinder.__init__),
        (ref.SnpKmerFinder.__init__, gki.SnpKmerFinder.__init__),
        (ref.unique_variant_kmers.UniqueVariantKmersFinder.__init__,
         our_uvk.UniqueVariantKmersFinder.__init__),
        (ref.CollisionFreeKmerIndex.from_flat_kmers.__func__,
         our_ki.CollisionFreeKmerIndex.from_flat_kmers.__func__),
        (ref.CollisionFreeKmerIndex.get, our_ki.CollisionFreeKmerIndex.get),
        (ref.CollisionFreeKmerIndex.map_kmers,
         our_ki.CollisionFreeKmerIndex.map_kmers),
        (ref.FlatKmers.__init__, our_fk.FlatKmers.__init__),
        (ref.ReverseKmerIndex.get_node_kmers_and_ref_positions,
         gki.ReverseKmerIndex.get_node_kmers_and_ref_positions),
        (ref.ReadKmers.from_fasta_file.__func__,
         gki.ReadKmers.from_fasta_file.__func__),
        (ref.CriticalGraphPaths.from_graph.__func__,
         gki.CriticalGraphPaths.from_graph.__func__),
        (ref.SnpKmerFinder.find_kmers, gki.SnpKmerFinder.find_kmers),
        (ref.DenseKmerFinder.find_only_kmers_starting_at_position,
         gki.DenseKmerFinder.find_only_kmers_starting_at_position),
    ]
    diffs = []
    for rf, of in pairs:
        rp = list(inspect.signature(rf).parameters)
        op = list(inspect.signature(of).parameters)
        missing = [p for p in rp if p not in op]
        if missing:
            diffs.append((rf.__qualname__, missing))
    assert not diffs, f"reference parameters missing here: {diffs}"
