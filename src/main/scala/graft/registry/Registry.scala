package graft.registry

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Feature-store registry model — the Spark-native shape of the
  * reference's Feast repo config + registry (round-tripped through YAML
  * at `feast_component/component.py:69-73` and rehydrated at
  * `executor.py:53-58`). We keep YAML as the interchange format but
  * parse it once into plain case classes: no tempdir dance, no
  * proto/YAML double encoding (reference defect §2.13).
  *
  * @param source  parquet path, relative to the job's data dir unless absolute
  * @param entities entity-key column names in the source table
  * @param timestamp event-timestamp column
  * @param createdTimestamp optional tie-break column
  * @param ttlSeconds freshness window (0/absent = unbounded)
  */
final case class FeatureView(
    name: String,
    source: String,
    entities: Seq[String],
    timestamp: String,
    features: Seq[String],
    createdTimestamp: Option[String] = None,
    ttlSeconds: Option[Long] = None)

/** `"view:feature"` reference string (reference format at
  * `example/usage_prototype.py:50-55`). */
final case class FeatureRef(view: String, feature: String)
object FeatureRef {
  def parse(s: String): FeatureRef = s.split(":", 2) match {
    case Array(v, f) => FeatureRef(v, f)
    case _ => throw new IllegalArgumentException(
      s"feature ref '$s' must look like 'view:feature'")
  }
}

/** Named bundle of feature refs (`component.py:47,80-97`). */
final case class FeatureService(name: String, features: Seq[FeatureRef])

final case class Registry(
    project: String,
    views: Map[String, FeatureView],
    services: Map[String, FeatureService]) {

  def view(name: String): FeatureView =
    views.getOrElse(name, throw new NoSuchElementException(
      s"feature view '$name' not in registry (have: ${views.keys.mkString(", ")})"))

  def service(name: String): FeatureService =
    services.getOrElse(name, throw new NoSuchElementException(
      s"feature service '$name' not in registry (have: ${services.keys.mkString(", ")})"))

  /** Resolve a features argument the way the reference's component does
    * (`component.py:80-102`): either explicit refs or a service name. */
  def resolve(features: Either[Seq[String], String]): Seq[FeatureRef] = features match {
    case Left(refs)  => refs.map(FeatureRef.parse)
    case Right(name) => service(name).features
  }
}

/** YAML registry loader (snakeyaml is on the Spark classpath).
  *
  * {{{
  * project: demo
  * views:
  *   - name: order_features
  *     source: orders.parquet
  *     entities: [o_custkey]
  *     timestamp: o_orderdate
  *     ttlSeconds: 7776000
  *     features: [o_totalprice, o_orderstatus]
  * services:
  *   - name: order_service
  *     features: ["order_features:o_totalprice"]
  * }}}
  */
object YamlRegistry {

  def loadFile(path: String): Registry =
    load(Files.readString(Paths.get(path)))

  def load(yaml: String): Registry = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml).asScala

    def seqOfMaps(key: String): Seq[collection.Map[String, Object]] =
      root.get(key) match {
        case Some(l: java.util.List[_]) =>
          l.asScala.toSeq.map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
        case _ => Nil
      }
    def strs(m: collection.Map[String, Object], key: String): Seq[String] =
      m.get(key) match {
        case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
        case _ => Nil
      }

    val views = seqOfMaps("views").map { m =>
      val v = FeatureView(
        name = m("name").toString,
        source = m("source").toString,
        entities = strs(m, "entities"),
        timestamp = m("timestamp").toString,
        features = strs(m, "features"),
        createdTimestamp = m.get("createdTimestamp").map(_.toString),
        ttlSeconds = m.get("ttlSeconds").map(_.toString.toLong).filter(_ > 0))
      v.name -> v
    }.toMap

    val services = seqOfMaps("services").map { m =>
      val s = FeatureService(
        name = m("name").toString,
        features = strs(m, "features").map(FeatureRef.parse))
      s.name -> s
    }.toMap

    Registry(root.get("project").map(_.toString).getOrElse("default"), views, services)
  }
}
