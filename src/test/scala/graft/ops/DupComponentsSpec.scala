package graft.ops

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSuite

/** Property test for the large-star/small-star loop at the heart of
  * [[Dedup.dupComponents]]: on random edge sets the fixpoint must equal
  * brute-force BFS connected components — including long chains, where
  * the O(log n) round bound (vs propagation's O(diameter)) actually
  * matters. */
class DupComponentsSpec extends SparkSuite {

  /** Run the production algorithm over an explicit edge list. */
  private def propagate(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val schema = StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType)))
    val df = spark.createDataFrame(edges.map { case (a, b) => Row(a, b) }.asJava, schema)
    Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
