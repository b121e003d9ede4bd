package graft.jobs

import java.io.File
import java.net.InetSocketAddress
import java.nio.file.Files

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Cli

/** S9/S10 ingest: HTTP download against a local JDK HttpServer (no egress)
  * and HDFS put through the Hadoop FileSystem API over a file:// root —
  * the identical code path production uses against hdfs://. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withServer(payload: Array[Byte])(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/trip-data/", { ex =>
      if (ex.getRequestURI.getPath.endsWith("missing.parquet") ||
          ex.getRequestURI.getPath.contains("2024-02")) {
        ex.sendResponseHeaders(404, -1)
      } else {
        ex.sendResponseHeaders(200, payload.length.toLong)
        ex.getResponseBody.write(payload)
      }
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/trip-data")
    finally server.stop(0)
  }

  test("S9 httpDownload fetches, is atomic, and honors skip-missing on 404") {
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    withServer(payload) { base =>
      val dir = Files.createTempDirectory("ingest").toFile
      val dest = new File(dir, "yellow_tripdata_2024-01.parquet")
      assert(Ingest.httpDownload(s"$base/yellow_tripdata_2024-01.parquet", dest).contains(4096L))
      assert(dest.length() == 4096L)
      assert(!new File(dir, dest.getName + ".part").exists()) // temp renamed away
      // 404 + skipMissing -> None; without -> IOException
      assert(Ingest.httpDownload(s"$base/missing.parquet", new File(dir, "m.parquet"),
        skipMissing = true).isEmpty)
      intercept[java.io.IOException](
        Ingest.httpDownload(s"$base/missing.parquet", new File(dir, "m.parquet")))
    }
  }

  test("S10 hdfsPut mkdirs + overwrites through the FileSystem API") {
    val local = Files.createTempFile("put", ".parquet").toFile
    Files.write(local.toPath, "abc".getBytes)
    val root = Files.createTempDirectory("hdfs-root").toString
    val dest = Ingest.hdfsPut(spark.sparkContext.hadoopConfiguration, local,
      s"file://$root/year=2024/month=01")
    val landed = new File(s"$root/year=2024/month=01/${local.getName}")
    assert(landed.exists() && landed.length() == 3)
    // put -f semantics: re-put with new content overwrites
    Files.write(local.toPath, "abcdef".getBytes)
    Ingest.hdfsPut(spark.sparkContext.hadoopConfiguration, local, s"file://$root/year=2024/month=01")
    assert(landed.length() == 6)
    assert(dest.getName == local.getName)
  }

  test("IngestMain downloads the month loop + catalogs; PutMain ships to the raw root") {
    // a real (tiny) parquet payload so the manifest's schema sniff works
    val pq = Files.createTempDirectory("pq").toString + "/p"
    spark.range(3).selectExpr("id AS doc_id").coalesce(1).write.parquet(pq)
    val payload = Files.readAllBytes(
      new File(pq).listFiles().filter(_.getName.endsWith(".parquet")).head.toPath)

    withServer(payload) { base =>
      val outDir = Files.createTempDirectory("ingest-main").toString
      val cfg = Cli.parse(Seq(
        "--year", "2024", "--months", "1,2", "--base-url", base,
        "--output-dir", outDir, "--skip-missing"))
      IngestMain.run(spark, cfg) // month 02 404s and is skipped
      assert(new File(outDir, "yellow_tripdata_2024-01.parquet").exists())
      assert(!new File(outDir, "yellow_tripdata_2024-02.parquet").exists())
      val manifest = spark.read.option("multiLine", "true").json(s"$outDir/manifest.json")
      assert(manifest.count() == 1)
      assert(manifest.head.getAs[scala.collection.Seq[String]]("columnas") == Seq("doc_id"))

      val hdfsRoot = Files.createTempDirectory("put-root").toString
      PutMain.run(spark, cfg.copy(localDir = outDir, rawRoot = s"file://$hdfsRoot"))
      assert(new File(s"$hdfsRoot/year=2024/month=01/yellow_tripdata_2024-01.parquet").exists())
      // without skip-missing, the absent month fails fast
      intercept[IllegalStateException](
        PutMain.run(spark, cfg.copy(localDir = outDir, rawRoot = s"file://$hdfsRoot",
          months = Seq(2), skipMissing = false)))
    }
  }
}
