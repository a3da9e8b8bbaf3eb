"""Visualization adapters (reference ``pygraphblas/gviz.py``).

The reference renders matrices/vectors as graphviz graphs and matplotlib
images inside notebooks. This module generates the same DOT source with
pure Python (no dependency), and upgrades to a live ``graphviz.Source``
object only if the graphviz package is importable — the sandbox has no
graphviz, so the DOT text is the first-class product and is fully tested.

All rendering collects the matrix to the driver: this is a small-graph
notebook inspection surface, same contract as the reference (gviz.py:66).
"""

from __future__ import annotations

from typing import Optional


def _fmt(v) -> str:
    if isinstance(v, float):
        return f"{v:.3g}"
    return str(v)


def graph_dot(
    A,
    name: str = "",
    rankdir: str = "LR",
    directed: bool = True,
    weights: bool = True,
    labels: bool = True,
    label_vector: Optional[dict] = None,
    concentrate: bool = True,
) -> str:
    """DOT source for a Matrix viewed as a graph (reference
    gviz.py:66 ``draw_graph``). ``label_vector`` maps vertex id to label."""
    kind = "digraph" if directed else "graph"
    arrow = "->" if directed else "--"
    lines = [f'{kind} "{name}" {{']
    lines.append(
        f'  rankdir={rankdir}; overlap=false; '
        f'concentrate={"true" if concentrate else "false"};'
    )
    i, j, v = A.to_arrays()
    seen = set()
    for a, b in zip(i, j):
        for n in (int(a), int(b)):
            if n not in seen:
                seen.add(n)
                label = (
                    _fmt(label_vector.get(n, n)) if label_vector is not None else n
                )
                lines.append(f'  {n} [label="{label if labels else ""}"];')
    for a, b, w in zip(i, j, v):
        attr = f' [label="{_fmt(w)}"]' if weights else ""
        lines.append(f"  {int(a)} {arrow} {int(b)}{attr};")
    lines.append("}")
    return "\n".join(lines)


def vector_dot(V, name: str = "", rankdir: str = "LR") -> str:
    """DOT source for a Vector as a node chain (reference gviz.py:58)."""
    lines = [f'digraph "{name}" {{', f"  rankdir={rankdir}; node [shape=record];"]
    cells = "|".join(f"<f{int(i)}> {int(i)}: {_fmt(v)}" for i, v in zip(*V.to_arrays()))
    lines.append(f'  v [label="{cells}"];')
    lines.append("}")
    return "\n".join(lines)


def matrix_dot(A, name: str = "") -> str:
    """DOT source rendering the matrix as an HTML-like grid node
    (reference gviz.py:277 ``draw_matrix``)."""
    d = A.to_dict()
    rows = []
    for r in range(A.nrows):
        cells = "".join(
            f"<TD>{_fmt(d[(r, c)]) if (r, c) in d else ''}</TD>"
            for c in range(A.ncols)
        )
        rows.append(f"<TR>{cells}</TR>")
    table = f'<<TABLE BORDER="0" CELLBORDER="1" CELLSPACING="0">{"".join(rows)}</TABLE>>'
    return "\n".join(
        [f'digraph "{name}" {{', "  node [shape=none];", f"  m [label={table}];", "}"]
    )


def draw(obj, name: str = "", **kw):
    """Render a Matrix or Vector (reference gviz.py:242 ``draw``): returns
    a ``graphviz.Source`` when graphviz is installed (notebooks render it
    inline), otherwise the DOT source string."""
    from pygraphblas_spark.matrix import Matrix
    from pygraphblas_spark.vector import Vector

    if isinstance(obj, Matrix):
        dot = graph_dot(obj, name, **kw)
    elif isinstance(obj, Vector):
        dot = vector_dot(obj, name, **kw)
    else:
        raise TypeError(f"cannot draw {type(obj)}")
    try:  # pragma: no cover — graphviz not in the sandbox
        import graphviz

        return graphviz.Source(dot)
    except ImportError:
        return dot


# Reference-compatible aliases (gviz.py names).
draw_graph = graph_dot
draw_vector_dot = vector_dot
draw_matrix = matrix_dot


def cy_matrix(M, directed: bool = True) -> dict:
    """Cytoscape-JSON graph dict (reference gviz.py:446) — pure data, so
    it works without cyjupyter; feed it to any cytoscape renderer."""
    nodes: dict = {}
    edges = []
    i, j, v = M.to_arrays()
    order = sorted(range(len(i)), key=lambda k: (int(i[k]), int(j[k])))
    for k in order:
        a, b, w = int(i[k]), int(j[k]), v[k]
        edges.append(
            {"data": {"id": f"{a}:{b}:{_fmt(w)}", "source": str(a), "target": str(b)}}
        )
        nodes.setdefault(a, {"data": {"id": str(a)}})
        nodes.setdefault(b, {"data": {"id": str(b)}})
    return {
        "directed": directed,
        "elements": {"nodes": list(nodes.values()), "edges": edges},
    }


def draw_cy(M, **kw):  # pragma: no cover — cyjupyter not in the sandbox
    """Interactive cytoscape widget (reference gviz.py:492)."""
    from cyjupyter import Cytoscape

    return Cytoscape(data=cy_matrix(M), **kw)
