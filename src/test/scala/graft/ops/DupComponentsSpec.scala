package graft.ops

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSuite

/** Property test for the min-label-propagation loop at the heart of
  * [[Dedup.dupComponents]]: on random edge sets the fixpoint must equal
  * brute-force BFS connected components — including long chains, which
  * stress the iteration-to-diameter behavior that shallow near-dup
  * clusters never exercise. */
class DupComponentsSpec extends SparkSuite {

  /** The same propagation loop dupComponents runs, over explicit edges. */
  private def propagate(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(StructField("u", LongType), StructField("v", LongType)))
    val sym = edges.flatMap { case (a, b) => Seq(Row(a, b), Row(b, a)) }
    val e = spark.createDataFrame(sym.asJava, schema).cache()
    var comp = e.select(col("u").as("doc_id")).distinct()
      .withColumn("comp_id", col("doc_id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val viaNbr = e.join(comp, e("v") === comp("doc_id"))
        .select(e("u").as("doc_id"), col("comp_id"))
      val next = comp.unionByName(viaNbr)
        .groupBy("doc_id").agg(min("comp_id").as("comp_id")).localCheckpoint()
      changed = next.as("n").join(comp.as("o"), "doc_id")
        .filter(col("n.comp_id") =!= col("o.comp_id")).count()
      comp = next
      iter += 1
    }
    e.unpersist()
    comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    val seen = scala.collection.mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!seen.contains(start)) {
        val queue = scala.collection.mutable.Queue(start)
        val members = scala.collection.mutable.Set(start)
        while (queue.nonEmpty) {
          val n = queue.dequeue()
          adj.getOrElse(n, Seq.empty).foreach { m =>
            if (members.add(m)) queue += m
          }
        }
        val label = members.min
        members.foreach(m => seen(m) = label)
      }
    }
    seen.toMap
  }

  private val edgeSets: Gen[Seq[(Long, Long)]] =
    Gen.chooseNum(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.chooseNum(0L, 15L)
        b <- Gen.chooseNum(0L, 15L) if a != b
      } yield (a, b))
    }

  test("propagation fixpoint equals brute-force components on random graphs") {
    val prop = Prop.forAll(edgeSets) { edges =>
      edges.isEmpty || propagate(edges) == bruteForce(edges)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("a 12-node chain (worst-case diameter) resolves to one component") {
    val chain = (0L until 11L).map(i => (i, i + 1))
    val got = propagate(chain)
    assert(got.values.toSet === Set(0L))
    assert(got.keySet === (0L to 11L).toSet)
  }
}
