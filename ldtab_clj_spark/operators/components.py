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

    labels = nodes.withColumn("component", F.col("a")).localCheckpoint()
    for _ in range(MAX_ROUNDS):
        # propagate the min label across one hop
        prop = (edges.join(labels, on="a")
                .select(F.col("b").alias("a"), "component"))
        new_labels = (labels.select("a", "component").union(prop)
                      .groupBy("a")
                      .agg(F.min("component").alias("component"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), on="a")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("a").alias("blank"), "component")


def assign_components(thin: DataFrame) -> DataFrame:
    """Attach a stanza-group key to every thin triple:

    * triples touching a blank node get that blank's component id;
    * ground triples are their own singleton stanzas (content hash).

    Output: thin schema with doc_id replaced by the group key — ready
    for operators/stanza.thin_to_thick_df.
    """
    comp = blank_components(thin)
    bs = comp.withColumnRenamed("blank", "subject") \
             .withColumnRenamed("component", "_cs")
    bo = comp.withColumnRenamed("blank", "object") \
             .withColumnRenamed("component", "_co")
    # plain left joins: AQE broadcasts the component map when it's
    # small; at external-RDF scale (billions of bnodes) it must shuffle
    out = (thin.join(bs, on="subject", how="left")
           .join(bo, on="object", how="left"))
    ground_key = F.concat(F.lit("g:"), F.md5(F.concat_ws(
        "\x1f", "subject", "predicate", "object", "datatype")))
    return (out.withColumn(
        "doc_id", F.coalesce("_cs", "_co", ground_key))
        .drop("_cs", "_co"))
