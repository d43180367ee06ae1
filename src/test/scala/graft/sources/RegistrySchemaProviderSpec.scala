package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RegistrySchemaProvider.{Response, Transport}

class RegistrySchemaProviderSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"R","fields":[{"name":"id","type":"string"}]}"""
  // registry responses embed the schema as a JSON STRING field
  private def ok(schema: String): Response = Response(200,
    "{\"schema\": " +
      new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(schema) + "}")

  private final class Scripted(script: Seq[() => Response])
      extends Transport {
    val calls = new AtomicInteger(0)
    val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def get(url: String): Response = {
      urls.add(url)
      script(math.min(calls.getAndIncrement(), script.size - 1))()
    }
  }

  test("200 resolves, is cached per id, and hits the protocol URL") {
    val t = new Scripted(Seq(() => ok(schemaJson)))
    val p = new RegistrySchemaProvider("http://registry:8081/", t)
    assert(p.resolve(7).contains(schemaJson))
    assert(p.resolve(7).contains(schemaJson)) // cache: no second GET
    assert(t.calls.get() == 1)
    assert(t.urls.peek() == "http://registry:8081/schemas/ids/7")
    // a different id is its own fetch
    assert(p.resolve(8).contains(schemaJson))
    assert(t.calls.get() == 2)
  }

  test("404 is None and NOT negative-cached (late registration recovers)") {
    val t = new Scripted(Seq(
      () => Response(404, """{"error_code":40403}"""),
      () => ok(schemaJson)))
    val p = new RegistrySchemaProvider("http://r", t)
    assert(p.resolve(9).isEmpty)
    assert(p.resolve(9).contains(schemaJson))
    assert(t.calls.get() == 2)
  }

  test("5xx and IOException retry with backoff, then succeed") {
    val t = new Scripted(Seq(
      () => Response(503, "busy"),
      () => throw new java.io.IOException("connection reset"),
      () => ok(schemaJson)))
    val p = new RegistrySchemaProvider("http://r", t, maxRetries = 2,
      backoffMs = 1L)
    assert(p.resolve(1).contains(schemaJson))
    assert(t.calls.get() == 3)
  }

  test("persistent outage THROWS (task retry), never silent DLQ routing") {
    val p5 = new RegistrySchemaProvider("http://r",
      new Scripted(Seq(() => Response(500, "err"))), maxRetries = 1,
      backoffMs = 1L)
    assert(intercept[IllegalStateException] { p5.resolve(1) }
      .getMessage.contains("HTTP 500"))
    val pIo = new RegistrySchemaProvider("http://r",
      new Scripted(Seq(() => throw new java.io.IOException("down"))),
      maxRetries = 1, backoffMs = 1L)
    intercept[java.io.IOException] { pIo.resolve(1) }
    // 4xx other than 404 is a hard protocol error, no retry
    val t401 = new Scripted(Seq(() => Response(401, "auth")))
    val p401 = new RegistrySchemaProvider("http://r", t401, maxRetries = 2,
      backoffMs = 1L)
    intercept[IllegalStateException] { p401.resolve(1) }
    assert(t401.calls.get() == 1)
  }

  test("malformed 200 body is a loud failure, not a silent miss") {
    for (body <- Seq("{}", """{"schema": 42}""", "not json")) {
      val p = new RegistrySchemaProvider("http://r",
        new Scripted(Seq(() => Response(200, body))))
      intercept[IllegalStateException] { p.resolve(1) }
    }
  }

  test("provider serializes (executor closure) and re-resolves after") {
    val p = new RegistrySchemaProvider("http://r",
      RegistrySchemaProviderSpec.StandaloneTransport)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(p)
    val copy = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[RegistrySchemaProvider]
    assert(copy.resolve(3).contains("x"))
  }
}

object RegistrySchemaProviderSpec {
  // top-level (captures nothing): the spec instance itself is not
  // serializable, so the round-trip test needs a standalone transport
  private object StandaloneTransport extends Transport {
    def get(url: String): Response = Response(200, """{"schema": "x"}""")
  }
}
