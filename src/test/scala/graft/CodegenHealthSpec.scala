package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins whole-stage-codegen HEALTH on the plan shapes that regressed
  * in round 15: the fused curate quality+language gates (batch and
  * the streaming front-end apply the identical predicates) blew past
  * Janino's 64 KB method limit — Spark logged
  * `ERROR CodeGenerator: Failed to compile` and silently fell back to
  * interpreted execution, a perf cliff with zero correctness signal.
  * The fix made `TextAnalysis.langId` state each language score once
  * (array_max argmax) instead of re-inlining every score into every
  * CaseWhen branch.
  *
  * The counter is [[TestSpark.codegenErrors]]: a log4j2 appender on
  * Spark's CodeGenerator logger installed at session creation, so it
  * observes EVERY plan any suite ran before this one in the forked
  * test JVM — the global check catches a regression anywhere, the
  * targeted one localizes the known-bad shapes.
  */
class CodegenHealthSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("curate gates + quality features whole-stage-compile (the r15 Janino 64KB shapes)") {
    val before = TestSpark.codegenErrors.get()
    val docs = (1L to 256L).map { i =>
      (i, s"the and of is doc $i der und die ist el la le et est. " * 3)
    }.toDF("doc_id", "text")
    val cfg = Curation.CurationConfig()
    // the exact batch stage-1/2 composition (streaming curation
    // applies the same predicates per micro-batch)
    val gated = docs
      .filter(Curation.qualityPredicate(col("text"), cfg))
      .filter(Curation.languagePredicate(col("text"), cfg))
    assert(gated.count() > 0, "gate sanity: the markers-rich docs pass")
    // the q17/q18 projection surface: features + language in one stage
    val feats = graft.operators.TextAnalysis
      .qualityFeatures(docs, "doc_id", "text", carry = Seq("text"))
      .withColumn("lang", graft.operators.TextAnalysis.langId(col("text")))
    assert(feats.filter(col("lang") =!= "und").count() > 0)
    assert(TestSpark.codegenErrors.get() == before,
      s"CodeGenerator logged ${TestSpark.codegenErrors.get() - before} " +
        "compile failure(s) on the curate gate shapes — a stage is " +
        "running interpreted; check the langId/qualityPredicate tree size")
  }

  test("no CodeGenerator compile failures anywhere in the suites run so far") {
    assert(TestSpark.codegenErrors.get() == 0,
      s"${TestSpark.codegenErrors.get()} CodeGenerator ERROR(s) were " +
        "logged by earlier suites in this JVM — some plan silently fell " +
        "back to interpreted execution; grep the suite log for " +
        "'Failed to compile' to locate it")
  }
}
