"""Independent numpy oracles replicating the reference algorithm formulas.

PageRank follows gap/prmark.py:8-30 literally; CC/LPA/triangles are exact
dense computations. These are NOT Spark code — they exist so the engine's
distributed results can be checked against single-machine ground truth
(SURVEY.md §5: no SuiteSparse in this env, so the oracle is the formula).
"""

import numpy as np


def pagerank_oracle(I, J, n, damping=0.85, tol=1e-4, max_iters=100):
    """Dense PageRank per gap/prmark.py: w = t/d (dangling drop out),
    r = teleport + Aᵀw, L1 convergence."""
    A = np.zeros((n, n))
    A[I, J] = 1.0
    d = A.sum(axis=1) / damping  # out-degree / damping
    r = np.full(n, 1.0 / n)
    teleport = (1 - damping) / n
    for _ in range(max_iters):
        t = r
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where(d > 0, t / d, 0.0)  # emult: dangling contribute 0
        r = teleport + A.T @ w
        rdiff = np.abs(t - r).sum()
        if rdiff <= tol:
            break
    return r


def cc_oracle(I, J, n):
    """Min-label diffusion to fixpoint on the symmetrized graph."""
    A = np.zeros((n, n), dtype=bool)
    A[I, J] = True
    A |= A.T
    labels = np.arange(n)
    while True:
        new = labels.copy()
        for v in range(n):
            nbrs = np.where(A[:, v])[0]
            if len(nbrs):
                new[v] = min(labels[v], labels[nbrs].min())
        if (new == labels).all():
            return labels
        labels = new


def lpa_oracle(I, J, n, max_iters=20):
    """Synchronous LPA, most-frequent neighbor label, min tie-break."""
    A = np.zeros((n, n), dtype=bool)
    A[I, J] = True
    A |= A.T
    np.fill_diagonal(A, False)
    labels = np.arange(n)
    for _ in range(max_iters):
        new = labels.copy()
        for v in range(n):
            nbrs = np.where(A[:, v])[0]
            if len(nbrs) == 0:
                continue
            vals, counts = np.unique(labels[nbrs], return_counts=True)
            new[v] = vals[counts == counts.max()].min()
        if (new == labels).all():
            break
        labels = new
    return labels


def triangle_oracle(I, J, n):
    """Exact global triangle count: trace(A³)/6 on the symmetrized
    simple graph."""
    A = np.zeros((n, n))
    A[I, J] = 1.0
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0.0)
    return int(round(np.trace(A @ A @ A) / 6.0))


def betweenness_oracle(I, J, n, directed=True):
    """Brandes betweenness (unweighted) — the reference algorithm
    (gap/bcmark.py forward/backward passes) in plain Python."""
    adj = [[] for _ in range(n)]
    for i, j in zip(I, J):
        if i == j:
            continue
        if j not in adj[i]:
            adj[i].append(j)
        if not directed and i not in adj[j]:
            adj[j].append(i)
    bc = np.zeros(n)
    for s in range(n):
        sigma = np.zeros(n)
        sigma[s] = 1.0
        dist = np.full(n, -1)
        dist[s] = 0
        order = [s]
        head = 0
        while head < len(order):
            v = order[head]
            head += 1
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n)
        for w in reversed(order):
            for x in adj[w]:
                if dist[x] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc
