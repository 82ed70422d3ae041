package graft

import graft.operators.{Autotune, IndexLifecycle, IndexStatus, TierLifecycle}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pins (ScalaCheck) for the PURE load-bearing
  * contracts the example-based specs sample pointwise: the state
  * file's round-trip under HOSTILE caller-controlled stream ids (the
  * hex-encoding exists precisely because ids are free-form paths —
  * a quote, comma, newline or non-ASCII char must never corrupt the
  * regex parser), the watermark map's LRU-bound invariants, the
  * bucket/axis-floor arithmetic, and the driver-JSON escaper. These
  * are the seams where a single unconsidered input class becomes
  * silent data loss at 100 TB (a corrupted replay guard re-lands
  * batches; a mis-parsed state misreports size forever).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def check(name: String, prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // free-form stream ids: printable ASCII incl. JSON metacharacters,
  // control chars, and non-ASCII — everything a checkpoint path or a
  // caller-invented identity could contain
  private val hostileId: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', ',', '}', '{', ':', '\n',
      '\t', '/', ' ', 'ä', '学', ''))).map(_.mkString)

  test("state file round-trips ANY watermark map (hostile ids, order preserved)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_state")
    try {
      val genEntry = for { id <- hostileId; b <- Gen.chooseNum(0L, Long.MaxValue) } yield (id, b)
      val genStatus = for {
        alg <- Gen.oneOf("ivf", "ivfpq", "sq8", "bq", "pca", "knngraph")
        built <- Gen.oneOf(true, false)
        dirty <- Gen.oneOf(true, false)
        size <- Gen.chooseNum(0L, Long.MaxValue)
        dim <- Gen.chooseNum(0, 4096)
        at <- Gen.chooseNum(0L, Long.MaxValue)
        v <- Gen.chooseNum(0, Int.MaxValue)
        dc <- Gen.chooseNum(0L, Long.MaxValue)
        tv <- Gen.chooseNum(0L, Long.MaxValue)
        entries <- Gen.listOfN(8, genEntry)
      } yield IndexStatus(alg, built, dirty, size, dim, at, v, dc, tv,
        scala.collection.immutable.ListMap.from(entries.distinctBy(_._1)))
      var i = 0
      check("state round-trip", Prop.forAll(genStatus) { s0 =>
        i += 1
        val p = s"$dir/idx$i"
        IndexLifecycle.writeState(spark, p, s0)
        val back = IndexLifecycle.status(spark, p)
        back == s0 && back.appliedStreams.toSeq == s0.appliedStreams.toSeq
      }, min = 60)
    } finally graft.streaming.Streams.deleteTree(dir)
  }

  test("watermark LRU: bounded size, latest always present, re-record moves to back") {
    val genOps = Gen.listOf(for {
      id <- Gen.oneOf((0 until 100).map(i => s"stream-$i"))
      b <- Gen.chooseNum(0L, 1000L)
    } yield (id, b))
    check("lru", Prop.forAll(genOps) { ops =>
      val s = ops.foldLeft(IndexStatus("ivf", isBuilt = true, isDirty = false,
        0L, 0, 0L, 1, 0L, 0L)) { case (st, (id, b)) => st.withAppliedBatch(id, b) }
      val bounded = s.appliedStreams.size <= IndexStatus.MaxAppliedStreams
      val latestKept = ops.lastOption.forall { case (id, b) =>
        s.appliedBatchFor(id) == b && s.appliedStreams.toSeq.last._1 == id
      }
      // eviction drops the LEAST-recently-updated: the retained set is
      // exactly the last-touched MaxAppliedStreams distinct ids
      val expectKeys = ops.reverse.map(_._1).distinct
        .take(IndexStatus.MaxAppliedStreams).reverse
      bounded && latestKept && s.appliedStreams.keys.toSeq == expectKeys
    })
  }

  test("bucketsFor: floor 16, monotone non-decreasing, sqrt(n/2) class") {
    check("buckets", Prop.forAll(Gen.chooseNum(0L, 1L << 44)) { n =>
      val b = TierLifecycle.bucketsFor(n)
      val bNext = TierLifecycle.bucketsFor(n + (n / 10).max(1))
      b >= TierLifecycle.MinBuckets && bNext >= b &&
        // the growth class: within a small constant of sqrt(n/2)
        (n < 512 || (b <= math.sqrt(n / 2.0) * 2 + 16 && b >= math.sqrt(n / 2.0) / 2))
    })
  }

  test("axisFloor: axis bar at least the composed floor, and axis^2 covers it") {
    check("axisFloor", Prop.forAll(Gen.chooseNum(1, 1000)) { f =>
      val a = Autotune.axisFloor(f)
      a >= f && a <= 1000 && a.toLong * a >= f.toLong * 1000
    })
  }

  test("driver-JSON string escaper: decodable, round-trips any string") {
    def unescape(s: String): String = {
      // the inverse of Verify.jsonString's escape set (a tiny JSON
      // string decoder — the test's independent reading of the format)
      require(s.startsWith("\"") && s.endsWith("\""))
      val b = new StringBuilder
      var i = 1
      while (i < s.length - 1) {
        s.charAt(i) match {
          case '\\' =>
            s.charAt(i + 1) match {
              case 'n' => b.append('\n'); i += 2
              case 'r' => b.append('\r'); i += 2
              case 't' => b.append('\t'); i += 2
              case 'u' =>
                b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c => b.append(c); i += 2
            }
          case c =>
            // no raw control char or quote may survive escaping
            assert(c >= ' ' && c != '"', s"raw 0x${c.toInt.toHexString}")
            b.append(c); i += 1
        }
      }
      b.toString
    }
    check("jsonString", Prop.forAll(hostileId) { raw =>
      unescape(Verify.jsonString(raw)) == raw
    })
  }
}
