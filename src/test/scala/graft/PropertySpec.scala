package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeomCodec
import graft.sources.{GdalOptions, RawFeature, SchemaInference}

/** Property tests per SURVEY.md §5 plan: schema inference is stable under
  * field-order/missing-field permutations, and geometry codecs round-trip
  * arbitrary coordinates. */
class PropertySpec extends AnyFunSuite {
  private val opts = GdalOptions.from(Map.empty)

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val fieldNames = Gen.oneOf("a", "b", "c", "d")
  private val value: Gen[Any] = Gen.oneOf[Any](
    Gen.const(null), Gen.chooseNum(-1000, 1000),
    Gen.chooseNum(-1e6, 1e6), Gen.alphaStr, Gen.oneOf(true, false))
  private val feature: Gen[RawFeature] = for {
    names <- Gen.someOf(Seq("a", "b", "c", "d"))
    vals <- Gen.sequence[Seq[Any], Any](names.map(_ => value))
  } yield RawFeature(0, null, names.zip(vals).toIndexedSeq)

  test("schema inference: missing-field permutations never change a column's type, only presence") {
    check(Prop.forAll(Gen.listOfN(8, feature)) { fs =>
      val schema = SchemaInference.infer(fs.iterator, opts)
      // inferring over the same features twice is deterministic
      val again = SchemaInference.infer(fs.iterator, opts)
      schema == again
    })
  }

  test("schema inference: appending features only widens, never narrows") {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case IntegerType => 0; case LongType => 1; case DoubleType => 2
      case StringType => 3; case _ => 3
    }
    check(Prop.forAll(Gen.listOfN(5, feature), Gen.listOfN(5, feature)) { (fs, more) =>
      val s1 = SchemaInference.infer(fs.iterator, opts)
      val s2 = SchemaInference.infer((fs ++ more).iterator, opts)
      s1.fields.filter(_.name != "geometry").forall { f =>
        s2.fields.find(_.name == f.name).forall { g =>
          f.dataType == g.dataType ||
            (rank(g.dataType) >= rank(f.dataType)) || // numeric widening
            g.dataType == StringType // mixed fallback
        }
      }
    })
  }

  private val coord: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-180.0, 180.0)
    lat <- Gen.chooseNum(-90.0, 90.0)
  } yield (lon, lat)

  test("codec: WKB->WKT->WKB round-trips arbitrary points within text precision") {
    // WKT is decimal text — JTS's writer is not a lossless double codec, so
    // the contract is coordinate equality within 1e-9 (WKB itself is exact).
    check(Prop.forAll(coord) { case (lon, lat) =>
      val wkb = GeomCodec.point(lon, lat)
      val g = GeomCodec.fromWkb(GeomCodec.wktToWkb(GeomCodec.wkbToWkt(wkb)))
      math.abs(g.getCoordinate.x - lon) < 1e-9 && math.abs(g.getCoordinate.y - lat) < 1e-9
    })
  }

  test("codec: GeoJSON round-trips arbitrary linestrings exactly") {
    check(Prop.forAll(Gen.listOfN(5, coord)) { cs =>
      cs.distinct.size < 2 || {
        val wkt = cs.map { case (x, y) => s"$x $y" }.mkString("LINESTRING (", ", ", ")")
        val wkb = GeomCodec.wktToWkb(wkt)
        java.util.Arrays.equals(wkb, GeomCodec.geoJsonToWkb(GeomCodec.wkbToGeoJson(wkb)))
      }
    })
  }

  // ---- text/hash kernels vs independent reimplementations ----

  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.{ShingleKernels, TextKernels}

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  test("kernel: shingle_set equals the naive split/sliding/distinct formulation") {
    check(Prop.forAll(doc) { text =>
      val got = {
        val a = ShingleKernels.shingleSet(UTF8String.fromString(text), 3)
        (0 until a.numElements()).map(a.getUTF8String(_).toString).toSet
      }
      val toks = text.trim.split("\\s+").toSeq
      val want =
        if (toks.length < 3) Set.empty[String]
        else toks.sliding(3).map(_.mkString("\u0000")).toSet
      got == want
    })
  }

  test("kernel: md5_lower64 equals java MD5 bytes 8..15 little-endian") {
    check(Prop.forAll(word) { w =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      val expect = (0 until 8).map(j => (d(8 + j) & 0xFFL) << (8 * j)).reduce(_ | _)
      TextKernels.md5Lower64(UTF8String.fromString(w)) == expect
    })
  }

  test("kernel: simhash64 is permutation- and duplication-invariant over tokens") {
    val tokens = Gen.listOfN(10, word)
    check(Prop.forAll(tokens) { ts =>
      def sig(xs: Seq[String]): Long = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(UTF8String.fromString).toArray[Any])
        TextKernels.simhash64(arr)
      }
      val base = sig(ts)
      sig(scala.util.Random.shuffle(ts)) == base && sig(ts ++ ts.take(3)) == base
    })
  }

  test("kernel: minhash band agreement rises with shingle overlap (min-wise sanity)") {
    // Two docs sharing 90% of shingles must share ≥1 of 32 bands (the
    // property the defective affine family violated); disjoint docs
    // virtually never collide on all comparisons run here.
    val base = Gen.listOfN(40, word).map(_.distinct).suchThat(_.size >= 20)
    check(Prop.forAll(base) { ws =>
      def bands(xs: Seq[String]): Seq[Long] = {
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          xs.map(UTF8String.fromString).toArray[Any])
        val b = ShingleKernels.minhashBands(arr)
        (0 until b.numElements()).map(b.getLong)
      }
      val a = bands(ws)
      val near = bands(ws.drop(1)) // J = (n-1)/n >= 0.95
      a.zip(near).exists { case (x, y) => x == y }
    })
  }

  // ---- SpatiaLite geometry blob -> WKB vs JTS-parsed fixture truth ----

  test("spatialite blob: synthetic XY multipolygon round-trips through toWkb") {
    // Build a SpatiaLite blob by hand for a 1-triangle multipolygon and
    // check the produced WKB parses to the same coordinates.
    val bb = java.nio.ByteBuffer.allocate(200).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0x00.toByte).put(0x01.toByte).putInt(4326)
    bb.putDouble(0).putDouble(0).putDouble(4).putDouble(4) // MBR
    bb.put(0x7C.toByte)
    bb.putInt(6) // MULTIPOLYGON
    bb.putInt(1) // n geoms
    bb.put(0x69.toByte).putInt(3) // entity: POLYGON
    bb.putInt(1) // rings
    bb.putInt(4) // points
    Seq((0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)).foreach { case (x, y) =>
      bb.putDouble(x); bb.putDouble(y)
    }
    bb.put(0xFE.toByte)
    val blob = java.util.Arrays.copyOf(bb.array(), bb.position())
    val wkb = graft.sources.spatialite.SpatiaLiteGeom.toWkb(blob)
    val g = GeomCodec.fromWkb(wkb)
    assert(g.getGeometryType === "MultiPolygon")
    assert(g.getNumPoints === 4)
    assert(g.getCoordinates.map(c => (c.x, c.y)).toSeq ===
      Seq((0.0, 0.0), (4.0, 0.0), (2.0, 3.0), (0.0, 0.0)))
    assert(graft.sources.spatialite.SpatiaLiteGeom.srid(blob) === 4326)
  }

  test("r-tree: search over arbitrary boxes equals the brute-force scan") {
    import graft.sources.flatgeobuf.FgbIndex
    import graft.sources.flatgeobuf.FgbIndex.Box
    val boxGen = for {
      x <- Gen.chooseNum(-100.0, 100.0); y <- Gen.chooseNum(-100.0, 100.0)
      w <- Gen.chooseNum(0.0, 10.0); h <- Gen.chooseNum(0.0, 10.0)
    } yield Box(x, y, x + w, y + h)
    val itemsGen = Gen.chooseNum(1, 200).flatMap(n => Gen.listOfN(n, boxGen))
    check(Prop.forAll(itemsGen, boxGen, Gen.chooseNum(2, 20)) { (items, q, nodeSize) =>
      val sorted = FgbIndex.hilbertOrder(items.toIndexedSeq).map(items)
      val bytes = FgbIndex.build(
        sorted.zipWithIndex.map { case (b, i) => (b, i.toLong * 64) }, nodeSize)
      val read = (first: Long, count: Int) => {
        val out = java.nio.ByteBuffer.allocate(count * FgbIndex.NodeBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put(bytes, first.toInt * FgbIndex.NodeBytes, count * FgbIndex.NodeBytes)
        out
      }
      val got = FgbIndex.search(read, sorted.length, nodeSize, q).map(_._2).toSet
      val want = sorted.indices.filter(i => q.intersects(sorted(i))).map(_.toLong).toSet
      got == want
    })
  }

  test("hilbert: distances are unique per grid cell (bijectivity sample)") {
    import graft.sources.flatgeobuf.FgbIndex
    val cells = for (x <- 0L until 32L; y <- 0L until 32L) yield FgbIndex.hilbert(x, y, 5)
    assert(cells.toSet.size === 1024)
    assert(cells.min === 0L && cells.max === 1023L)
  }

  test("scrubPii: scrubbing is a fixpoint (scrubbed text re-scrubs to itself)") {
    val s = TestSpark.spark; import s.implicits._
    val textGen = Gen.listOfN(5, Gen.oneOf(
      "plain words here", "a@b.co", "reach me at user.name+x@example.org now",
      "10.0.0.1", "ip 192.168.255.12 end", "123456789012", "x 99 y",
      "<EMAIL>", "a@b@c.com")).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = graft.api.Graft.scrubPii(df, "text")
        .select("id", "text", "n_emails", "n_ips", "n_nums")
      val rows1 = once.collect().sortBy(_.getLong(0))
      val twice = graft.api.Graft.scrubPii(once.select("id", "text"), "text")
        .collect().sortBy(_.getLong(0))
      // second pass finds nothing and changes nothing
      rows1.zip(twice).forall { case (a, b) =>
        a.getString(1) == b.getString(1) &&
          b.getLong(2) == 0L && b.getLong(3) == 0L && b.getLong(4) == 0L
      }
    })
  }

  test("packSequences: per-shard invariants (ordered fill, budget-bounded starts)") {
    val s = TestSpark.spark; import s.implicits._
    val tokGen = Gen.chooseNum(1L, 900L)
    check(Prop.forAll(Gen.listOfN(40, tokGen)) { toks =>
      val df = toks.zipWithIndex.map { case (t, i) =>
        (if (i % 2 == 0) "a" else "b", i.toLong, t)
      }.toDF("shard", "id", "n_tokens")
      val out = graft.api.Graft.packSequences(df, "n_tokens", "shard", "id", budget = 1000L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      out.values.forall { rows =>
        val sorted = rows.sortBy(_._2)
        // seq ids never decrease in fill order, and each doc STARTS
        // within its sequence's budget window (cum-before div budget)
        val cums = sorted.map(_._3).scanLeft(0L)(_ + _)
        sorted.zip(cums).forall { case ((_, _, _, seq), cumBefore) =>
          seq == cumBefore / 1000L
        }
      }
    })
  }

  test("kernel: nfc_normalize is idempotent, matches java Normalizer, ASCII is identity") {
    import org.apache.spark.unsafe.types.UTF8String
    val anyStr = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const('e'), Gen.const('́'), // combining acute
      Gen.const('é'), Gen.const('Å'), // é, Å (angstrom sign)
      Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(anyStr) { s =>
      val once = graft.functions.TextKernels.nfcNormalize(UTF8String.fromString(s))
      val twice = graft.functions.TextKernels.nfcNormalize(once)
      val expected = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      once.toString == expected && twice.toString == expected
    })
    // pure-ASCII short-circuit returns the SAME object (no allocation)
    val ascii = UTF8String.fromString("plain ascii text")
    assert(graft.functions.TextKernels.nfcNormalize(ascii) eq ascii)
  }

  test("kernel: kmeansAssign equals the naive squared-distance argmin") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // integer-valued components keep double arithmetic exact, so the
    // cc − 2·v·c score and the naive Σ(v−c)² formulation must agree on
    // the argmin (including the lowest-cid tie rule)
    val dim = 4
    val comp = Gen.chooseNum(-8, 8).map(_.toDouble)
    val vec = Gen.listOfN(dim, comp).map(_.toArray)
    val gen = for {
      v <- Gen.listOfN(dim, comp.map(_.toFloat)).map(_.toArray)
      k <- Gen.chooseNum(1, 5)
      cs <- Gen.listOfN(k, vec).map(_.toArray)
    } yield (v, cs)
    check(Prop.forAll(gen) { case (v, cs) =>
      val ccs = cs.map(c => c.map(x => x * x).sum)
      val got = graft.functions.VecKernels.kmeansAssign(
        new GenericArrayData(v), cs, ccs, isFloat = true)
      val naive = cs.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum, i)
      }.minBy { case (d, i) => (d, i) }._2
      got == naive
    })
  }

  test("property: MJPEG/AVI synth -> walk -> decode recovers every closed-form gray") {
    import graft.operators.Multimodal
    val gen = for {
      seed <- Gen.chooseNum(0L, 5000L)
      n <- Gen.chooseNum(1, 6)
    } yield (seed, n)
    check(Prop.forAll(gen) { case (seed, n) =>
      val frames = Multimodal.aviFrames(Multimodal.aviSynth(seed, n)).get
      frames.length == n && frames.zipWithIndex.forall { case (img, f) =>
        val want = (((seed * 11 + f * 37) % 256 + 256) % 256).toInt
        (img.getRGB(0, 0) & 0xFF) == want &&
          (img.getRGB(7, 7) & 0xFF) == want
      }
    })
  }
}
