"""Blank-node connected components (SURVEY.md J2).

Reference: parsing.clj:40-48 / rdf_model.clj:14-29 — the transitive
closure over subject→blank-object edges that groups a stanza's triples.
The doc-derived pipeline avoids this entirely (components are
document-local by construction); for *external* RDF sources (N-Triples
files), blank labels are file-global and the closure must run for real.

Spark realization: min-label propagation to fixpoint — an iterative
self-join loop with ``localCheckpoint()`` per round to cut lineage
(the standard connected-components-on-DataFrames pattern; OWL bnode
graphs are shallow, so rounds ≈ tree depth, typically < 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 32


def min_label_components(edges: DataFrame,
                         nodes: DataFrame) -> DataFrame:
    """Generic connected components by iterative min-label propagation
    with pointer doubling. ``edges``: (a, b) with BOTH directions
    present; ``nodes``: (a). Returns (a, component) where component is
    the minimum node label in a's component. O(log diameter) rounds,
    one self-join + one aggregate per round, lineage cut per round."""
    labels = nodes.withColumn("component", F.col("a")).localCheckpoint()
    converged = False
    for _ in range(MAX_ROUNDS):
        # propagate the min label across one hop ...
        prop = (edges.join(labels, on="a")
                .select(F.col("b").alias("a"), "component"))
        hop = (labels.select("a", "component").union(prop)
               .groupBy("a")
               .agg(F.min("component").alias("component")))
        # ... then short-cut: component := label(component) — pointer
        # doubling makes convergence O(log diameter), so long
        # rdf:first/rdf:rest chains (unbounded in real ontologies)
        # don't need diameter-many rounds
        lut = labels.select(F.col("a").alias("component"),
                            F.col("component").alias("_parent"))
        new_labels = (hop.join(lut, on="component", how="left")
                      .select("a",
                              F.least("component", "_parent")
                              .alias("component"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), on="a")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"component closure did not converge in "
            f"{MAX_ROUNDS} rounds — pathological graph")
    return labels


def blank_components(thin: DataFrame) -> DataFrame:
    """Label every blank node with a component id (the min blank label
    reachable through shared triples). Returns (blank, component)."""
    s = thin.filter("is_blank_s").select(F.col("subject").alias("a"))
    o = thin.filter("is_blank_o").select(F.col("object").alias("a"))
    nodes = s.union(o).distinct()

    # undirected edges between blank nodes that co-occur in one triple
    both = thin.filter("is_blank_s AND is_blank_o")
    edges = (both.select(F.col("subject").alias("a"),
                         F.col("object").alias("b"))
             .union(both.select(F.col("object").alias("a"),
                                F.col("subject").alias("b")))
             .distinct().localCheckpoint())

    return (min_label_components(edges, nodes)
            .select(F.col("a").alias("blank"), "component"))


def assign_components(thin: DataFrame) -> DataFrame:
    """Attach a stanza-group key to every thin triple:

    * triples touching a blank node get that blank's component id;
    * ground triples are their own singleton stanzas (content hash).

    Output: thin schema with doc_id replaced by the group key — ready
    for operators/stanza.thin_to_thick_df.
    """
    comp = blank_components(thin)
    bs = comp.select(F.col("blank").alias("_sk"),
                     F.col("component").alias("_cs"))
    bo = comp.select(F.col("blank").alias("_ok"),
                     F.col("component").alias("_co"))
    # join keys are masked by the blank flags so a LITERAL whose
    # lexical form looks like "_:b1" can never hijack a blank node's
    # component. Plain left joins: AQE broadcasts the component map
    # when small; at external-RDF scale (billions of bnodes) it shuffles
    out = (thin
           .withColumn("_sk", F.when(F.col("is_blank_s"),
                                     F.col("subject")))
           .withColumn("_ok", F.when(F.col("is_blank_o"),
                                     F.col("object")))
           .join(bs, on="_sk", how="left")
           .join(bo, on="_ok", how="left")
           .drop("_sk", "_ok"))
    ground_key = F.concat(F.lit("g:"), F.md5(F.concat_ws(
        "\x1f", "subject", "predicate", "object", "datatype")))
    return (out.withColumn(
        "doc_id", F.coalesce("_cs", "_co", ground_key))
        .drop("_cs", "_co"))
