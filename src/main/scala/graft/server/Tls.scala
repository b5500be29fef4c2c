package graft.server

import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS for the serving facades — the reference's server TLS config
  * (`reference/tls.go` GetTLSConfig: certificate + key [+ CA] loaded into a
  * `tls.Config`; cluster wiring `reference/server/cluster_test.go:129-137`).
  * The JVM-native input is a PKCS12 keystore holding the server key + cert
  * chain (`keytool -genkeypair` mints a self-signed one; a CA-issued pair
  * imports via `keytool -importkeystore`), from which both facades derive
  * their engines:
  *
  *   - HTTPS: [[sslContext]] → `HttpsServer` + `HttpsConfigurator`
  *   - gRPC:  [[keyManagers]] → netty `SslContextBuilder.forServer` via the
  *     shaded `GrpcSslContexts` (ALPN/h2 configured there)
  *
  * [[trustStore]] exposes the keystore's certificate chains as trust
  * anchors — what a client of a self-signed deployment pins (the
  * reference's `--tls.ca-certificate` role). */
object Tls {

  /** PKCS12 keystore path + password. */
  final case class Config(keyStore: String, password: String)

  def loadKeyStore(cfg: Config): KeyStore = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(cfg.keyStore))
    try ks.load(in, cfg.password.toCharArray) finally in.close()
    ks
  }

  def keyManagers(cfg: Config): KeyManagerFactory = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadKeyStore(cfg), cfg.password.toCharArray)
    kmf
  }

  /** In-memory truststore of every certificate in the keystore's chains —
    * a private-key entry's chain is NOT implicitly trusted by
    * `TrustManagerFactory`, so re-home the certs as trusted entries. */
  def trustStore(cfg: Config): KeyStore = {
    val src = loadKeyStore(cfg)
    val ts = KeyStore.getInstance("PKCS12")
    ts.load(null, null)
    val aliases = src.aliases()
    while (aliases.hasMoreElements) {
      val a = aliases.nextElement()
      val chain = Option(src.getCertificateChain(a)).map(_.toSeq)
        .getOrElse(Option(src.getCertificate(a)).toSeq)
      chain.zipWithIndex.foreach { case (c, i) =>
        ts.setCertificateEntry(s"$a-$i", c)
      }
    }
    ts
  }

  def trustManagers(cfg: Config): TrustManagerFactory = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trustStore(cfg))
    tmf
  }

  /** Server-side SSLContext for the JDK `HttpsServer`. */
  def sslContext(cfg: Config): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers(cfg).getKeyManagers, null, null)
    ctx
  }

  /** Client-side SSLContext pinned to the keystore's certs (spec/tooling
    * side of a self-signed deployment). */
  def clientContext(cfg: Config): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, trustManagers(cfg).getTrustManagers, null)
    ctx
  }
}
