package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** The SparkSessionExtensions deployment path: a session built with
  * GraftExtensions resolves the custom expressions from pure SQL with
  * no per-call registration. */
class ExtensionsSpec extends SparkSpec {

  test("custom expressions resolve via spark.sql.extensions in a fresh session") {
    spark.sparkContext // ensure the shared context exists
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT rolling_hash('abc') AS rh,
          |       simhash_pack(array(CAST(7 AS BIGINT))) AS sh,
          |       size(minhash_pack(array(CAST(7 AS BIGINT)), 8)) AS mh_k,
          |       size(shingle_hashes('abcdef', 5)) AS n_sh
          |""".stripMargin).head()
      // rolling_hash('abc') = ('a'*31 + 'b')*31 + 'c'
      assert(row.getLong(0) == (('a' * 31L + 'b') * 31L + 'c'))
      // one token hash 7: signature bits = bits of 7
      assert(row.getLong(1) == 7L)
      assert(row.getInt(2) == 8)
      assert(row.getInt(3) == 2) // 'abcde', 'bcdef'
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
