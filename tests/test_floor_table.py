"""HLO parser behind scripts/mse_floor_table.py (the PERF_FLOORS.md
generator): instruction names, layouts/tiling annotations, tuple types,
operand extraction, byte accounting."""

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "mse_floor_table",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "mse_floor_table.py"))
flt = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(flt)

HLO = """
HloModule jit_run_epochs, entry_computation_layout={...}

%fused_computation.1 (param_0: bf16[5000,5032]) -> bf16[5000,5032] {
  %param_0 = bf16[5000,5032]{1,0:T(8,128)(2,1)} parameter(0)
  ROOT %neg = bf16[5000,5032]{1,0:T(8,128)(2,1)} negate(%param_0)
}

ENTRY %main {
  %p0 = bf16[5000,5032]{1,0:T(8,128)(2,1)} parameter(0)
  %p1 = f32[5,100]{1,0:T(8,128)S(1)} parameter(1)
  %fusion.742 = bf16[625,8,5032]{2,1,0:T(8,128)(2,1)S(1)} fusion(%p0), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(run_epochs)/gather[x]" source_file="a.py"}
  %tup.1 = (f32[5,100]{1,0:T(8,128)}, f32[92]{0:T(128)S(1)}) fusion(%p1, %fusion.742), kind=kOutput, calls=%fused_computation.1
  ROOT %done = f32[5,100]{1,0} get-tuple-element(%tup.1), index=0
}
"""


def test_parse_names_types_operands():
    insts = flt.parse_hlo(HLO)
    assert "fusion.742" in insts and "tup.1" in insts and "p0" in insts
    typ, ops, op = insts["fusion.742"]
    assert op == "fusion"
    assert ops == ["p0"]  # calls=/metadata= operands are stripped
    assert typ.startswith("bf16[625,8,5032]")
    # tuple output type captured whole (balanced parens)
    ttyp, tops, _ = insts["tup.1"]
    assert ttyp.startswith("(") and "f32[92]" in ttyp
    assert tops == ["p1", "fusion.742"]


def test_shape_bytes():
    assert flt.shape_bytes("bf16[5000,5032]{1,0:T(8,128)(2,1)}") \
        == 5000 * 5032 * 2
    assert flt.shape_bytes("(f32[5,100]{1,0}, f32[92]{0:T(128)S(1)})") \
        == 5 * 100 * 4 + 92 * 4
    assert flt.shape_bytes("f32[]{:T(128)}") == 4  # scalar: empty dims


def test_fusion_traffic_sums_operands_and_output():
    insts = flt.parse_hlo(HLO)
    got = flt.fusion_traffic("tup.1", insts)
    want = (5 * 100 * 4 + 92 * 4            # tuple output
            + 5 * 100 * 4                   # %p1
            + 625 * 8 * 5032 * 2)           # %fusion.742
    assert got == want
    assert flt.fusion_traffic("not_there", insts) is None
