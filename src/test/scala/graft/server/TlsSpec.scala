package graft.server

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** TLS on both serving facades (`reference/tls.go` GetTLSConfig;
  * `reference/server/cluster_test.go:129-137`): a self-signed PKCS12
  * keystore (keytool-minted, the JVM equivalent of the reference's PEM
  * pair) drives HTTPS on the HTTP facade and TLS on the gRPC facade;
  * clients pin the cert via the keystore-derived truststore. */
class TlsSpec extends SparkSpec {

  private lazy val cfg: Tls.Config = {
    val p = Files.createTempFile("graft-tls", ".p12")
    Files.delete(p) // keytool refuses to overwrite
    val pr = new ProcessBuilder(
      "keytool", "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "30", "-storetype", "PKCS12",
      "-keystore", p.toString, "-storepass", "changeit",
      "-dname", "CN=localhost", "-ext", "SAN=dns:localhost,ip:127.0.0.1")
      .redirectErrorStream(true).start()
    val out = new String(pr.getInputStream.readAllBytes())
    require(pr.waitFor() == 0, s"keytool failed: $out")
    Tls.Config(p.toString, "changeit")
  }

  test("HTTPS facade serves queries over TLS with a self-signed cert") {
    val f = new HttpFacade(spark, sfDir, 0, tls = Some(cfg))
    val port = f.start()
    try {
      val client = HttpClient.newBuilder()
        .sslContext(Tls.clientContext(cfg)).build()
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"https://localhost:$port/sql"))
          .POST(HttpRequest.BodyPublishers.ofString(
            "SELECT TOP(1) r_name FROM region")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200 && r.body().contains(""""data":"""), r.body())
      // a client that does NOT trust the cert is rejected in the handshake
      intercept[Exception] {
        HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(s"https://localhost:$port/version"))
            .build(),
          HttpResponse.BodyHandlers.ofString())
      }
      // the Go client's protobuf exchange runs over the SAME TLS channel
      // (client.go Query/Import under https):  QueryRequest{Query=1} →
      // Count over the pb wire, and /status reports https node URIs so the
      // client routes follow-ups back through TLS
      val qreq = {
        val q = "Count(All())".getBytes("UTF-8")
        val out = new java.io.ByteArrayOutputStream()
        out.write(0x0A); out.write(q.length); out.write(q); out.toByteArray
      }
      val pr = client.send(
        HttpRequest.newBuilder(URI.create(
          s"https://localhost:$port/index/region/query"))
          .header("Content-Type", "application/x-protobuf")
          .header("Accept", "application/x-protobuf")
          .POST(HttpRequest.BodyPublishers.ofByteArray(qreq)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(pr.statusCode() == 200 &&
        pr.body().toSeq == Seq(0x12, 4, 0x10, 5, 0x30, 5).map(_.toByte),
        pr.body().map(b => f"$b%02x").mkString(" "))
      val st = client.send(
        HttpRequest.newBuilder(URI.create(s"https://localhost:$port/status"))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(st.body().contains(""""scheme":"https""""), st.body())
    } finally f.stop()
  }

  test("TLS composes with authn/authz: 403 without a token, 200 with") {
    val secret = "0123456789abcdef0123456789abcdef".getBytes
    val perms = Auth.GroupPermissions.fromYaml(
      """user-groups:
        |  "readers":
        |    "region": "read"
        |admin: "admins"
        |""".stripMargin)
    val f = new HttpFacade(spark, sfDir, 0,
      auth = Some(Auth.Config(new Auth.TokenVerifier(secret), perms)),
      tls = Some(cfg))
    val port = f.start()
    try {
      val client = HttpClient.newBuilder()
        .sslContext(Tls.clientContext(cfg)).build()
      def post(path: String, body: String, token: Option[String]): Int = {
        val b = HttpRequest.newBuilder(URI.create(s"https://localhost:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        token.foreach(t => b.header("Authorization", s"Bearer $t"))
        client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      }
      assert(post("/index/region/query", "Count(All())", None) == 403)
      val tok = Auth.TokenVerifier.sign(secret, "uid", "user",
        Seq(Auth.Group("readers")))
      assert(post("/index/region/query", "Count(All())", Some(tok)) == 200)
    } finally f.stop()
  }

  test("gRPC facade serves queries over TLS") {
    val g = new GrpcFacade(spark, sfDir, 0, tls = Some(cfg))
    val port = g.start()
    val ch = GrpcFacade.tlsChannel(port, cfg)
    try {
      val resp = GrpcFacade.call(ch, g.QuerySqlUnaryMethod,
        GrpcFacade.sqlRequest("SELECT TOP(1) r_name FROM region"))
      assert(resp.nonEmpty) // headers + one row came back over the TLS wire
      val hdr = new Proto.Reader(resp)
      assert(hdr.fields.contains(1) && hdr.fields.contains(2),
        "TableResponse must carry headers and a data row")
    } finally { ch.shutdownNow(); g.stop() }
  }

  override def afterAll(): Unit = {
    Files.deleteIfExists(java.nio.file.Paths.get(cfg.keyStore))
    super.afterAll()
  }
}
