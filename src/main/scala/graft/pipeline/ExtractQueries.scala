package graft.pipeline

import org.apache.spark.sql.functions._
import graft.queries.{Q, Tables}

/** Extraction-core queries (non-SQL-expressible — rows-only driver
  * check; semantics are pinned by the golden-fixture ScalaTest suite
  * instead, see SURVEY.md §5.2).
  */
object ExtractQueries {

  /** Flagship: synthesize the transcript table from `documents`,
    * run the full per-turn extraction, return stable-ordered rows. */
  val qExtract = Q.noOracle("q20_extract_turns") { (s, d) =>
    val turns = TranscriptGen.fromDocuments(Tables.documents(s, d))
    ExtractJob.run(s, turns)
      .select(col("conv_id"), col("turn_idx"), col("platform"), col("title"),
        col("text_content"), col("metrics.fallback_stage").as("fallback_stage"))
      .orderBy(col("conv_id"), col("turn_idx"))
  }

  /** Per-platform extraction metrics rollup (north rule metrics). */
  val qMetrics = Q.noOracle("q21_extract_metrics") { (s, d) =>
    val turns = TranscriptGen.fromDocuments(Tables.documents(s, d))
    ExtractJob.run(s, turns)
      .groupBy(col("platform"))
      .agg(
        count(lit(1)).as("n_turns"),
        avg(col("metrics.boilerplate_ratio")).as("avg_boilerplate_ratio"),
        avg(col("metrics.nodes_scored").cast("double")).as("avg_nodes_scored"),
        avg(when(col("metrics.fallback_stage") === 5, 1.0).otherwise(0.0))
          .as("body_fallback_rate"))
      .orderBy(col("platform"))
  }

  /** Per-conversation reassembly of extracted turns in stable
    * (conv_id, turn_idx) order (ForumExtractor.reorganizeContent at
    * table scale; SURVEY.md §2.8/§2.10). */
  val qReassemble = Q.noOracle("q22_extract_reassembly") { (s, d) =>
    val turns = TranscriptGen.fromDocuments(Tables.documents(s, d))
    Reassembly.conversations(ExtractJob.run(s, turns))
      .orderBy(col("conv_id"))
  }

  val all: Seq[Q] = Seq(qExtract, qMetrics, qReassemble)
}
