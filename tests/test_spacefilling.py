"""The unrolled Hilbert arithmetic (as emitted into both engines)
against the classic rot-and-accumulate reference algorithm."""


def _reference_xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _unrolled_xy2d(hx, hy):
    """Mirror of the CASE arithmetic the query emits (quadrant value:
    ry=1 → 1/2 by rx; ry=0 → 0/3 by rx; reflect-255-and-swap)."""
    x, y, d = hx, hy, 0
    for s in (128, 64, 32, 16, 8, 4, 2, 1):
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((2 if rx else 1) if ry else (3 if rx else 0))
        if ry == 0:
            x, y = (255 - y if rx else y), (255 - x if rx else x)
    return d


def test_quadrant_table_2x2_and_4x4():
    # classic tables via the reference implementation
    assert [_reference_xy2d(2, x, y)
            for x, y in [(0, 0), (0, 1), (1, 1), (1, 0)]] == [0, 1, 2, 3]
    inv = {_reference_xy2d(4, x, y): (x, y)
           for x in range(4) for y in range(4)}
    assert all(abs(inv[d][0] - inv[d + 1][0])
               + abs(inv[d][1] - inv[d + 1][1]) == 1 for d in range(15))


def test_unrolled_matches_reference_on_256_grid():
    for x in range(0, 256, 23):
        for y in range(0, 256, 29):
            assert _unrolled_xy2d(x, y) == _reference_xy2d(256, x, y)
    # every cell of a coarse block too
    for x in range(64, 72):
        for y in range(190, 198):
            assert _unrolled_xy2d(x, y) == _reference_xy2d(256, x, y)
