"""PySpark-native link-graph analytics engine.

From-scratch reimplementation of the query/data-processing capabilities of
``saibalmars/GraphRicciCurvature`` (reference at /root/reference, studied for
semantics only — see SURVEY.md for the file:line parity map), re-expressed
Spark-first: DataFrame joins + vectorized Arrow/pandas UDFs, never per-row
Python.

Public surface:

- :func:`sources.edges.edges_from_documents` — deterministic link-graph
  derivation from a documents/pages table.
- :func:`sources.extract.extract_text`, ``extract_links`` — HTML → text/links
  (byte-identical per-url invariant).
- :func:`operators.ollivier.ricci_curvature_edges` — Ollivier-Ricci curvature
  (OTD / ATD / Sinkhorn / OTDSinkhornMix), ``component`` (exact, fixture
  parity) and ``ego`` (web-scale) modes.
- :func:`operators.flow.ricci_flow` — discrete Ricci flow with per-round
  checkpoint/metrics/resume.
- :func:`operators.community.ricci_community` — modularity-drop community
  detection.
- :func:`operators.forman.forman_curvature` — Forman-Ricci (1d + augmented).
- :mod:`operators.pagerank`, ``components``, ``labelprop``, ``triangles``,
  ``degrees`` — north-rule graph kernels.
- :mod:`operators.dedup`, ``similarity``, ``textstats`` — training-data
  pipeline operators (exact/MinHash/SimHash dedup, ANN cosine, text quality).
- :mod:`operators.linkgraph` — HITS, SALSA, k-core/k-truss, PPR,
  Adamic-Adar, clustering/assortativity/reciprocity, BFS/SSSP, harmonic,
  neighborhood + HyperBall (HLL) family, distance distribution.
- :mod:`operators.webgraph` — exact SCC, Broder bow-tie decomposition,
  host-level graph rollup, bounded Katz centrality.
- :mod:`operators.urltools` — URL canonicalization (codegen column algebra).
- :mod:`operators.filtering` — composed curation verdicts
  (``document_filter``) and reproducible md5-fraction ``hash_sample``.
"""

__version__ = "0.1.0"
