"""graphforge_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
Skreen5hot/GraphForge (a browser PWA that forges RDF graphs from document
folders and queries them with SPARQL).

This is NOT a port: the reference runs single-threaded JavaScript in a
browser event loop; this engine expresses the same computation — document →
triples → deduplicated graph → materialized N-Quads → SPARQL-shaped queries —
as declarative PySpark DataFrame plans designed for 1000-executor clusters:

- extraction is a vectorized Arrow-batched UDF (reference:
  docs/scripts/graphProcessor.js:203-304), exploded and deduplicated JVM-side
- the graph store is a ``triples(subj, pred, obj, obj_is_literal, graph)``
  DataFrame with set semantics (reference: N3.Store, graphProcessor.js:1)
- queries are Catalyst plans (reference delegates to Comunica,
  docs/scripts/queryManager.js:120-122)
- incremental builds are checkpoint-table anti-joins (reference: mtime
  freshness gate, graphProcessor.js:36-50)
"""

__version__ = "0.1.0"

TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_is_literal", "graph"]
