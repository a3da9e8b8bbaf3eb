"""Reference-parity demo: idiomatic pygraphblas user code, unchanged.

Every pattern below is lifted from how users write against the reference
(Graphegon/pygraphblas) — type-bound ops, ``@`` matmul, masked Sandia
triangle counting, level-BFS via repeated vxm, operator sugar, and
``with``-scoped defaults — and runs as-is on this engine. The only
difference is construction: Spark needs a session, so constructors take
``spark`` first.

Run:  python examples/reference_parity_demo.py
"""

from pygraphblas_spark import (
    BOOL,
    FP64,
    INT64,
    Matrix,
    Vector,
    descriptor,
    get_spark,
)


def main() -> None:
    spark = get_spark("reference-parity-demo", cores="8")

    # The canonical 7-node doc graph (reference pygraphblas/__init__.py:183)
    I = [0, 0, 1, 1, 2, 3, 3, 4, 5, 6, 6, 6]
    J = [1, 3, 4, 6, 5, 0, 2, 5, 2, 2, 3, 4]
    A = Matrix.from_lists(spark, I, J, True, 7, 7)
    print("A:", A.nrows, "x", A.ncols, "nvals", A.nvals)

    # --- type-bound semirings, reference style -------------------------
    W = A.cast(FP64)
    paths2 = W.mxm(W, semiring=FP64.PLUS_TIMES)  # 2-hop path counts
    print("2-hop pairs:", paths2.nvals)

    # --- @ matmul + with-scoped semiring -------------------------------
    with INT64.PLUS_TIMES:
        hops2 = A.cast(INT64) @ A.cast(INT64)
    assert hops2.pattern().iseq(paths2.pattern())

    # --- Sandia triangle counting (reference demo) ---------------------
    sym = A.eadd(A.T, BOOL.LOR)
    L = sym.tril(-1)
    tris = L.mxm(L, mask=L, semiring=INT64.PLUS_PAIR).reduce_int()
    print("triangles:", tris)  # 2: {1,4,6} and {2,3,6}

    # --- level BFS by repeated masked vxm (reference BFS demo shape) ---
    frontier = Vector.from_lists(spark, [0], [True], 7, typ="BOOL")
    levels = Vector.from_lists(spark, [0], [0], 7, typ="INT64")
    lvl = 0
    while frontier.nvals:
        lvl += 1
        frontier = frontier.vxm(
            sym, semiring=BOOL.LOR_LAND, mask=levels, desc=descriptor.C
        )
        if frontier.nvals == 0:
            break
        levels = levels.eadd(frontier.apply_first(lvl, "FIRST"), "FIRST")
    print("bfs levels:", levels.to_dict())

    # --- operator sugar + select ---------------------------------------
    D = W.mxm(W.T, semiring=FP64.PLUS_TIMES)
    hot = (D + D).select(">", 2.0)  # eadd sugar then value select
    print("hot cells:", hot.nvals)

    # --- extract / assign slicing, strides included --------------------
    block = D[0:4:2, :]  # GxB_STRIDE: rows 0, 2, 4
    print("strided block shape:", block.shape, "nvals:", block.nvals)

    spark.stop()


if __name__ == "__main__":
    main()
