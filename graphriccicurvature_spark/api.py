"""Reference-shaped API facade.

Mirrors the two public classes of the reference
(OllivierRicci: reference/GraphRicciCurvature/OllivierRicci.py:621-894,
FormanRicci: reference/GraphRicciCurvature/FormanRicci.py:25-153) so a user
of ``saibalmars/GraphRicciCurvature`` can switch with the same call shapes —
the graph argument is an ``edges(src, dst[, weight])`` DataFrame instead of
a NetworkX graph, and results come back as DataFrames.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .operators import community as _community
from .operators import flow as _flow
from .operators import forman as _forman
from .operators import ollivier as _ollivier
from .sources.edges import canonicalize, prepare_edges
from .util import set_verbose


class OllivierRicci:
    """Drop-in-shaped Ollivier-Ricci container over an edge DataFrame."""

    def __init__(
        self,
        edges: DataFrame,
        weight: str = "weight",
        alpha: float = 0.5,
        method: str = "OTDSinkhornMix",
        base: float = math.e,
        exp_power: float = 2.0,
        nbr_topk: int = 3000,
        directed: bool = False,
        mode: str = "component",
        verbose: str = "ERROR",
    ):
        if weight != "weight" and weight in edges.columns:
            if "weight" in edges.columns:  # avoid ambiguous duplicate column
                edges = edges.drop("weight")
            edges = edges.withColumnRenamed(weight, "weight")
        edges = prepare_edges(edges)
        self.G = edges if directed else canonicalize(edges)
        self.alpha = alpha
        self.method = method
        self.base = base
        self.exp_power = exp_power
        self.nbr_topk = nbr_topk
        self.directed = directed
        self.mode = mode
        set_verbose(verbose)

    def _params(self):
        return dict(
            alpha=self.alpha,
            method=self.method,
            base=self.base,
            exp_power=self.exp_power,
            nbr_topk=self.nbr_topk,
        )

    def compute_ricci_curvature_edges(self, edge_list: DataFrame | None = None) -> DataFrame:
        """(src, dst, ricci_curvature) for the requested edges
        (reference :721-739)."""
        return _ollivier.ricci_curvature_edges(
            self.G, directed=self.directed, mode=self.mode, edge_list=edge_list,
            **self._params(),
        )

    def compute_ricci_curvature(self) -> DataFrame:
        """Edges with curvature; node curvature via :meth:`node_curvature`
        (reference :741-767 writes both onto G)."""
        k = self.compute_ricci_curvature_edges()
        self.G = self.G.select("src", "dst", "weight").join(k, ["src", "dst"])
        return self.G

    def node_curvature(self) -> DataFrame:
        assert "ricci_curvature" in self.G.columns, "run compute_ricci_curvature first"
        return _ollivier.node_curvature(self.G, self.G, directed=self.directed)

    def compute_ricci_flow(
        self,
        iterations: int = 10,
        step: float = 1.0,
        delta: float = 1e-4,
        surgery=None,
        surgery_every: int = 100,
        checkpoint_dir: str | None = None,
    ) -> DataFrame:
        """Flow metric on edges (reference :769-807; defaults match)."""
        assert not self.directed, "Ricci flow requires an undirected graph (as the reference)"
        self.G = _flow.ricci_flow(
            self.G, iterations=iterations, step=step, delta=delta,
            surgery=surgery, surgery_every=surgery_every,
            checkpoint_dir=checkpoint_dir, mode=self.mode, **self._params(),
        )
        return self.G

    def ricci_community(self, cutoff_step: float = 0.025, drop_threshold: float = 0.01):
        """(cutoff, clustering DataFrame) (reference :809-846)."""
        cut, clustering = _community.ricci_community(
            self.G, cutoff_step=cutoff_step, drop_threshold=drop_threshold,
            flow_kwargs={**self._params(), "mode": self.mode},
        )
        return cut, clustering

    def ricci_community_all_possible_clusterings(
        self, cutoff_step: float = 0.025, drop_threshold: float = 0.01
    ):
        return _community.ricci_community_all_possible_clusterings(
            self.G, cutoff_step=cutoff_step, drop_threshold=drop_threshold,
            flow_kwargs={**self._params(), "mode": self.mode},
        )

    def set_verbose(self, verbose: str) -> None:
        set_verbose(verbose)


class FormanRicci:
    """Drop-in-shaped Forman-Ricci container (reference FormanRicci.py:25-64)."""

    def __init__(
        self,
        edges: DataFrame,
        weight: str = "weight",
        method: str = "augmented",
        node_weights: DataFrame | None = None,
        verbose: str = "ERROR",
    ):
        if weight != "weight" and weight in edges.columns:
            if "weight" in edges.columns:  # avoid ambiguous duplicate column
                edges = edges.drop("weight")
            edges = edges.withColumnRenamed(weight, "weight")
        # directed inputs are folded to undirected (reference :59-62)
        self.G = canonicalize(prepare_edges(edges))
        self.method = method
        self.node_weights = node_weights
        set_verbose(verbose)

    def compute_ricci_curvature(self) -> DataFrame:
        self.G = self.G.select("src", "dst", "weight").join(
            _forman.forman_curvature(self.G, self.method, self.node_weights),
            ["src", "dst"],
        )
        return self.G

    def node_curvature(self, vertices: DataFrame | None = None) -> DataFrame:
        assert "forman_curvature" in self.G.columns, "run compute_ricci_curvature first"
        return _forman.forman_node_curvature(self.G, self.G, vertices)
