package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structural gate for the SILENT-interpreted-fallback class (r7 s12,
  * r9 mm07 — the third recurrence bought this spec): a Project whose
  * generated `processNext()` exceeds Janino's 64 KB method limit does
  * not fail the query — Spark logs one WARN and silently re-plans the
  * stage INTERPRETED, turning a codegen'd hash into a per-row tree
  * walk that plan-string asserts never see. This gate compiles every
  * WholeStageCodegen subtree of every registered batch query's
  * physical plan via the public `debug.codegenStringSeq` hook (which
  * returns `ByteCodeStats.UNAVAILABLE` = -1 sizes on a compile
  * failure) and fails the build if any subtree fails to compile or
  * exceeds `spark.sql.codegen.hugeMethodLimit` — the exact two
  * conditions `WholeStageCodegenExec.doExecute` falls back on.
  *
  * The gate session disables AQE: under AQE the pre-execution plan
  * carries no WholeStageCodegen nodes (stage collapse happens at
  * query-stage creation), which would make the probe vacuous. The
  * per-stage codegen shape is identical either way —
  * CollapseCodegenStages is the same rule AQE applies per stage. */
object CodegenGate {

  /** Compile every WholeStageCodegen subtree of `df`'s physical plan;
    * returns one message per subtree that would fall back at runtime
    * (compile failure, or max method bytecode over the huge-method
    * fallback threshold). Empty result = the plan runs fully
    * compiled. */
  def probe(df: DataFrame): Seq[String] = {
    val hugeLimit = df.sparkSession.conf
      .get("spark.sql.codegen.hugeMethodLimit", "65535").toInt
    val stats = org.apache.spark.sql.execution.debug
      .codegenStringSeq(df.queryExecution.executedPlan)
    stats.flatMap { case (subtree, _, st) =>
      val head = subtree.linesIterator.take(6).mkString("\n")
      if (st.maxMethodCodeSize < 0)
        Some(s"codegen COMPILE FAILURE (silent interpreted fallback):\n$head")
      else if (st.maxMethodCodeSize > hugeLimit)
        Some(s"codegen method ${st.maxMethodCodeSize} B > hugeMethodLimit " +
          s"$hugeLimit (silent interpreted fallback):\n$head")
      else None
    }
  }
}

class CodegenGateSpec extends AnyFunSuite {

  /** Dedicated session: AQE off so WholeStageCodegen nodes exist in the
    * pre-execution plan (see object scaladoc); shares the test
    * SparkContext. */
  private lazy val gateSpark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  private val sfDir = "/root/testdata/sf0.001"

  test("negative control: the gate catches a 64 KB-cliff expression (r9 mm07's original shape)") {
    // the r9 audioBands as shipped: the full sample→energy→band pyramid
    // inlined per band bit — ~1,500 ascii(substring(...)) nodes in one
    // Project expression, which Janino rejects (> 64 KB method) and
    // Spark silently runs interpreted. If this control ever PASSES the
    // probe, the gate is broken, not the expression fixed.
    def cliffBands(text: Column): Column = {
      def cp(i: Int): Column = ascii(substring(text, i + 1, 1))
      def sampleAbs(i: Int): Column = {
        val su = cp(2 * i) + cp(2 * i + 1) * 256
        abs(when(su >= 32768, su - 65536).otherwise(su))
      }
      def energy(r: Int, f: Int): Column =
        (0 until 4).map(i => sampleAbs(r * 36 + f * 4 + i)).reduce(_ + _)
      array((0 until 4).map { r =>
        (0 until 8).map(c =>
          when(energy(r, c) < energy(r, c + 1), lit(1 << c)).otherwise(lit(0)))
          .reduce(_ + _)
      }: _*)
    }
    val s = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = gateSpark.createDataFrame(
      gateSpark.sparkContext.parallelize(
        Seq(Row(1L, ("x" * 300))), 1), s)
    // a BARE Project of the giant expression compiles (measured 9.7 KB
    // max method — ProjectExec splits top-level expressions into
    // sub-methods); it is the Generate(posexplode)-over-Project stage —
    // the r9 blocking-explode shape — whose consume path cannot split
    // and hits the cliff (measured maxMethodCodeSize = -1, i.e. Janino
    // rejection). Probe exactly that shape.
    val hashed = docs.select(col("doc_id").as("did"),
      cliffBands(col("text")).as("bands"))
    val hits = CodegenGate.probe(hashed.select(col("did"), col("bands"),
      posexplode(col("bands")).as(Seq("band", "bv"))))
    assert(hits.nonEmpty,
      "the gate failed to flag the known-over-64KB stage — probe broken")
    assert(hits.exists(_.contains("COMPILE FAILURE")), hits.mkString("\n"))
  }

  test("every registered batch query's plan compiles under the huge-method limit (no silent interpreted fallback)") {
    // st* skipped: their returned DataFrame is a batch read of the
    // streaming run's landed result (construction would execute the
    // full checkpointed lifecycle for a plan that gates nothing —
    // their projections are small windowed aggregates); every other
    // query is built at sf0.001 and its physical plan compile-probed.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("st"))
    val failures = names.flatMap { name =>
      val hits =
        try CodegenGate.probe(SparkEntry.queries(name)(gateSpark, sfDir))
        catch { case e: Throwable =>
          Seq(s"query construction/planning threw ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
        }
      hits.map(h => s"$name: $h")
    }
    assert(failures.isEmpty,
      s"${failures.size} silent-fallback stage(s):\n${failures.mkString("\n\n")}")
  }

  test("every streaming query's batch-side plan compiles under the huge-method limit") {
    // the st* queries themselves can't be constructed without running
    // their checkpointed streams, so each registers its per-batch /
    // batch-twin transform on STATIC frames via QuerySet.stBatchPlans
    // (same named function where one exists — st06's encode, st11's
    // admit, st04's slice rebuild, st09's merge); this probes those.
    // Coverage is asserted first: a new st* query without a batch-side
    // plan fails here, not silently at runtime.
    val plans = SparkEntry.streamingBatchPlans
    val stNames = SparkEntry.queries.keys.filter(_.startsWith("st")).toSet
    assert(stNames.subsetOf(plans.keySet),
      s"streaming queries without a probed batch-side plan: ${(stNames -- plans.keySet).toSeq.sorted}")
    val failures = plans.keys.toSeq.sorted.flatMap { name =>
      val hits =
        try CodegenGate.probe(plans(name)(gateSpark, sfDir))
        catch { case e: Throwable =>
          Seq(s"plan construction threw ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
        }
      hits.map(h => s"$name: $h")
    }
    assert(failures.isEmpty,
      s"${failures.size} silent-fallback stage(s):\n${failures.mkString("\n\n")}")
  }

  test("bench twins: every benchPlans override names a registered query, executes, and stays codegen-clean") {
    // benchPlans substitute operator-only plans for gate-heavy queries
    // at BENCH time only (r14 verdict #6). Two failure modes to pin:
    // a twin keyed to a name Verify never oracle-checks (smuggled
    // query — benchQueries itself requires subset, asserted here too
    // for a readable failure), and a twin that silently falls off
    // whole-stage codegen while the verified form stays on it.
    val overrides = SparkEntry.sets.flatMap(_.benchPlans).toMap
    assert(overrides.nonEmpty, "expected the n22/n23 bench twins")
    assert(overrides.keySet.subsetOf(SparkEntry.queries.keySet),
      s"bench twins for unregistered queries: ${(overrides.keySet -- SparkEntry.queries.keySet).toSeq.sorted}")
    val failures = overrides.keys.toSeq.sorted.flatMap { name =>
      val hits =
        try {
          val df = overrides(name)(gateSpark, sfDir)
          assert(df.count() > 0, s"$name: bench twin returned 0 rows")
          CodegenGate.probe(df)
        } catch { case e: Throwable =>
          Seq(s"twin construction threw ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200))
        }
      hits.map(h => s"$name: $h")
    }
    assert(failures.isEmpty,
      s"${failures.size} silent-fallback stage(s):\n${failures.mkString("\n\n")}")
  }
}
