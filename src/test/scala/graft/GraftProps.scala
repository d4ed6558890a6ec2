package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.io.{SdaClient, WssLayout}
import graft.streaming.Sessionize

/** ScalaCheck properties over the pure (non-Spark) kernels. */
object GraftProps extends Properties("graft") {

  private val tsGen = Gen.listOf(Gen.chooseNum(0L, 1000L * 60 * 60 * 24))

  property("sessionize.fold covers every event exactly once") =
    forAll(tsGen) { ts =>
      val sorted = ts.sorted
      val sessions = Sessionize.fold(1L, sorted)
      sessions.map(_.n_events).sum == sorted.size
    }

  property("sessionize.fold sessions are disjoint and gap-separated") =
    forAll(tsGen) { ts =>
      val ss = Sessionize.fold(1L, ts.sorted).sortBy(_.start_ms)
      ss.forall(s => s.end_ms >= s.start_ms) &&
        ss.sliding(2).forall {
          case Seq(a, b) => b.start_ms - a.end_ms > Sessionize.gapMs
          case _ => true
        }
    }

  private val areaGen = for {
    st <- Gen.listOfN(2, Gen.alphaUpperChar).map(_.mkString)
    n <- Gen.chooseNum(0, 999)
  } yield f"$st$n%03d"

  property("wss zip name parse roundtrip") =
    forAll(areaGen, Gen.chooseNum(2000, 2030), Gen.chooseNum(1, 12), Gen.chooseNum(1, 28)) {
      (area, y, m, d) =>
        val date = f"$y%04d-$m%02d-$d%02d"
        WssLayout.parseZipName(s"wss_SSA_${area}_[$date].zip").contains((area, date))
    }

  property("sda payload always valid JSON-escaped (no raw quotes/newlines)") =
    forAll(Gen.asciiPrintableStr) { sql =>
      val p = SdaClient.requestPayload(sql)
      // every interior quote is escaped: strip the JSON structure quotes
      val body = p.drop("""{"format":"JSON+COLUMNNAME+METADATA","query":"""".length).dropRight(2)
      !body.replace("\\\\", "").replace("\\\"", "").contains('"') &&
        !p.contains('\n')
    }

  property("sda batching: ≤4 per batch, order preserved, nothing lost") =
    forAll(Gen.listOf(areaGen)) { areas =>
      val bs = SdaClient.batchAreasymbols(areas)
      bs.forall(_.size <= 4) && bs.flatten == areas
    }
}
