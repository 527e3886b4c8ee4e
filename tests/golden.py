"""Golden-file comparison utilities (the reference's assert_eq_order,
tests/common/mod.rs:34-51: skip N header lines, split tokens, numeric tokens
compared with 2e-4 relative tolerance, others exactly).

Three strictness levels:
- exact=True  — every token must match the golden byte-for-byte (used for
  original-precision fixtures: ua.xtc, pcpepg_selected.xtc, asymmetric/,
  multiple_resid_same_name.xtc — where this project's exactness claim can
  be pinned at the printed 4-decimal level);
- default     — the reference test-suite's tolerance plus one 4-dp print
  quantum (re-encoded split fixtures sit ±5 pm off the originals);
- atol=x      — documented per-case absolute tolerance for
  geometry-boundary-sensitive analyses of re-encoded fixtures.
"""

import math


def _items_equal(a: str, b: str, atol: float = None) -> bool:
    try:
        fa, fb = float(a), float(b)
    except ValueError:
        return a == b
    if math.isnan(fa) and math.isnan(fb):
        return True
    if fa == fb:
        return True
    if atol is not None:
        return abs(fa - fb) <= atol
    # golden values are printed at 4 decimals: allow one print quantum of
    # absolute slack (a true difference of 1e-8 can flip the 4th decimal
    # when the value sits on a rounding boundary), plus the reference
    # test-suite's 2e-4 relative tolerance
    return abs(fa - fb) <= max(1.05e-4, 2e-4 * max(abs(fa), abs(fb)))


def assert_eq_order(path_a: str, path_b: str, skip: int = 1,
                    csv: bool = False, atol: float = None,
                    exact: bool = False) -> None:
    with open(path_a) as fa, open(path_b) as fb:
        lines_a = fa.read().splitlines()[skip:]
        lines_b = fb.read().splitlines()[skip:]
    assert len(lines_a) == len(lines_b), (
        f"line count differs: {len(lines_a)} vs {len(lines_b)} "
        f"({path_a} vs {path_b})"
    )
    for la, lb in zip(lines_a, lines_b):
        if exact:
            # whole-line byte equality: alignment and padding must match
            # the reference presenters, not just the printed values
            assert la == lb, f"exact mismatch:\n  line A: {la}\n  line B: {lb}"
            continue
        ta = la.split(",") if csv else la.split()
        tb = lb.split(",") if csv else lb.split()
        assert len(ta) == len(tb), f"token count differs:\n  {la}\n  {lb}"
        for a, b in zip(ta, tb):
            assert _items_equal(a, b, atol), (
                f"mismatch: '{a}' vs '{b}'\n  line A: {la}\n"
                f"  line B: {lb}"
            )
