package graft

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot usable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
    // null-safe
    val n = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
    // non-double numeric arrays are cast, not misread (float has 4-byte
    // slots — an uncast ArrayData.getDouble would return garbage)
    val f = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(2, 3)) AS d").collect()(0).getDouble(0)
    assert(f === 9.0)
  }

  test("graft_cosine and graft_jpeg_dims usable from SQL") {
    GraftExtensions.register(spark)
    val c = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(2.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(c === 1.0)
    val jpeg = "FFD8FFC0001108" + "00F0" + "0140" + "03011100021100031100"
    val d = spark.sql(
      s"SELECT graft_jpeg_dims(unhex('$jpeg')).width AS w, " +
        s"graft_jpeg_dims(unhex('$jpeg')).height AS h")
      .collect()(0)
    assert(d.getInt(0) === 320 && d.getInt(1) === 240)
  }

  test("graft_json_key_first and graft_simhash usable from SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      """SELECT graft_json_key_first('{"a":{"SalesCompanyId":12}}',
        | 'SalesCompanyId') AS v""".stripMargin).collect()(0).getString(0)
    assert(v === "12")
    val sig = spark.sql(
      "SELECT graft_simhash(split('alpha beta gamma', ' ')) AS s")
      .collect()(0).getString(0)
    assert(sig === graft.operators.Dedup.simhashHex(
      Seq("alpha", "beta", "gamma")))
  }

  test("graft_hamming usable from SQL; digest of self is distance 0") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT graft_hamming('00ff', '00fe') AS d").collect()(0).getInt(0)
    assert(d === 1)
    val self = spark.sql(
      """SELECT graft_hamming(graft_simhash(split(t, ' ')),
        |  graft_simhash(split(t, ' '))) AS d
        |FROM (SELECT 'alpha beta gamma' AS t)""".stripMargin)
      .collect()(0).getInt(0)
    assert(self === 0)
  }

  test("graft_nfc usable from SQL: composes, fixes singletons, null-safe") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('cafe\\u0301'), graft_nfc('caf\\u00e9'), " +
        "graft_nfc('\\u212b'), graft_nfc(CAST(NULL AS STRING)), " +
        "length(graft_nfc('cafe\\u0301'))").collect()(0)
    assert(r.getString(0) === "caf\u00e9") // decomposed -> composed
    assert(r.getString(1) === "caf\u00e9") // already NFC: unchanged
    assert(r.getString(2) === "\u00c5")    // ANGSTROM SIGN singleton
    assert(r.isNullAt(3))
    assert(r.getInt(4) === 4)             // combining mark absorbed
  }

  test("graft_exif_orientation usable from SQL; junk probes null") {
    GraftExtensions.register(spark)
    // minimal big-endian EXIF APP1 carrying orientation 6
    val hex = "FFD8FFE10022457869660000" + "4D4D002A00000008" + "0001" +
      "01120003" + "00000001" + "00060000" + "00000000"
    val r = spark.sql(
      s"SELECT graft_exif_orientation(unhex('$hex')), " +
        "graft_exif_orientation(unhex('DEADBEEF')), " +
        "graft_exif_orientation(CAST(NULL AS BINARY))").collect()(0)
    assert(r.getInt(0) === 6)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("graft_deflate_len usable from SQL; repetition compresses") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_deflate_len(repeat('spam ', 200)), " +
        "graft_deflate_len('abc'), " +
        "graft_deflate_len(CAST(NULL AS STRING))").collect()(0)
    assert(r.getInt(0) < 100)  // 1000 repetitive bytes collapse
    assert(r.getInt(1) > 0 && r.getInt(1) <= 16)
    assert(r.isNullAt(2))
  }

  test("graft_char_counts: sorted-code-point histogram, one walk") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_char_counts('banana'), graft_char_counts(''), " +
        "graft_char_counts('aéaéé'), " + // non-ASCII overflow path
        "graft_char_counts(CAST(NULL AS STRING))").collect()(0)
    // 'banana': a=3, b=1, n=2 in ascending code-point order
    assert(r.getSeq[Long](0) === Seq(3L, 1L, 2L))
    assert(r.getSeq[Long](1) === Seq.empty[Long])
    assert(r.getSeq[Long](2) === Seq(2L, 3L)) // 'a' < 'é'
    assert(r.isNullAt(3))
    // surrogate pairs count as ONE character (code point), like
    // Spark's length()
    val s = spark.sql(
      "SELECT graft_char_counts('😀😀x')").collect()(0)
    assert(s.getSeq[Long](0) === Seq(1L, 2L)) // 'x' < U+1F600
  }
}
