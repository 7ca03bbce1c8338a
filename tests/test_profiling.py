"""op_profile tree accounting (utils/profiling.op_profile_total_ps).

The tree has two node species at/below the op level, verified against a
real TPU trace (2026-08-19): op-group nodes ("X and its duplicate(s)")
carry the INCLUSIVE time of their depth-4 duplicate children, while
fusion nodes hold all their time themselves with zero-rawTime instruction
children.  Summing every depth>=3 node double-counts the former (+10%
measured); summing only leaves drops the latter (-30% measured).  These
fixtures encode both species so the depth-3-only rule cannot regress
toward either wrong sum again.
"""

from dvae_tpu.utils.profiling import op_profile_total_ps


def _node(name, raw, children=()):
    return {"name": name, "metrics": {"rawTime": raw},
            "children": list(children)}


def _tree(categories):
    # byProgram(0) -> program(1) -> category(2) -> op(3) -> ...(4)
    return {"byProgram": _node("root", 0, [
        _node("program jit_run", 0, categories)])}


def test_flat_op_level():
    tree = _tree([_node("convolution", 30, [
        _node("dot.1", 20), _node("dot.2", 10)])])
    assert op_profile_total_ps(tree) == 30


def test_duplicate_groups_not_double_counted():
    """An op group's rawTime is inclusive of its duplicate children —
    the all-depths sum would report 60 here."""
    tree = _tree([_node("copy", 30, [
        _node("copy.15 and its duplicate(s)", 30, [
            _node("copy.15", 18), _node("copy.99", 12)])])])
    assert op_profile_total_ps(tree) == 30


def test_fusion_self_time_not_dropped():
    """A fusion's instruction children carry zero rawTime — a leaves-only
    sum would report 0 here."""
    tree = _tree([_node("output fusion", 400, [
        _node("fusion.777", 400, [
            _node("fused.multiply", 0), _node("fused.add", 0)])])])
    assert op_profile_total_ps(tree) == 400


def test_mixed_species_and_multiple_categories():
    tree = _tree([
        _node("output fusion", 500, [
            _node("fusion.1", 390, [_node("i.a", 0), _node("i.b", 0)]),
            _node("fusion.2 and its duplicate(s)", 110,
                  [_node("fusion.2", 60), _node("fusion.3", 50)])]),
        _node("non-fusion elementwise", 70, [
            _node("neg.8 and its duplicate(s)", 70,
                  [_node("neg.8", 40), _node("neg.9", 30)])]),
    ])
    assert op_profile_total_ps(tree) == 390 + 110 + 70


def test_idle_excluded():
    tree = _tree([_node("IDLE", 999, [_node("idle.0", 999)]),
                  _node("convolution", 25, [_node("dot.1", 25)])])
    assert op_profile_total_ps(tree) == 25


def test_missing_byprogram_key_falls_back_to_root():
    raw = _node("root", 0, [_node("prog", 0, [
        _node("cat", 7, [_node("op.1", 7)])])])
    assert op_profile_total_ps(raw) == 7
