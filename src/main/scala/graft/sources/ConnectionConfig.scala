package graft.sources

import java.util.Properties

/** Env-based connection configuration (SURVEY.md S10).
  *
  * The reference resolves every connection from environment variables
  * (`DB_HOSTNAME`/`DB_USERNAME`/`DB_PASSWORD`,
  * data_consistency_checks.py:30-32; `DB_TYPE`/`DB_USER`/`DB_PORT`/
  * `DB_DATABASE`, data_consistency_checks.py:153-158) and assembles a
  * SQLAlchemy-style URL from them. The Spark mapping is the same
  * twelve-factor shape: a config case class resolved with precedence
  * explicit override > environment > default, producing the JDBC
  * url + properties that [[Jdbc]] consumes.
  *
  * The env map is injected (defaulting to `sys.env`) so specs can pin
  * the resolution rules without mutating process state.
  */
final case class ConnectionConfig(
    dbType: String,
    host: String,
    port: String,
    database: String,
    user: String,
    password: String) {

  /** JDBC url in the engine-specific scheme. `derby` is the embedded
    * sandbox engine; `mysql`/`postgresql` are the reference's targets
    * (same API surface, different scheme — nothing else changes).
    */
  def jdbcUrl: String = dbType match {
    case "derby" => s"jdbc:derby:$database;create=true"
    case t       => s"jdbc:$t://$host:$port/$database"
  }

  def jdbcDriver: String = dbType match {
    case "derby"      => "org.apache.derby.jdbc.EmbeddedDriver"
    case "mysql"      => "com.mysql.cj.jdbc.Driver"
    case "postgresql" => "org.postgresql.Driver"
    case other        => throw new IllegalArgumentException(s"unknown DB_TYPE: $other")
  }

  def jdbcProps: Properties = {
    val p = new Properties()
    p.setProperty("driver", jdbcDriver)
    if (user.nonEmpty) p.setProperty("user", user)
    if (password.nonEmpty) p.setProperty("password", password)
    p
  }
}

object ConnectionConfig {

  /** Resolve from the environment using the reference's variable
    * names, with explicit overrides winning and embedded Derby as the
    * sandbox default.
    */
  def fromEnv(
      env: Map[String, String] = sys.env,
      overrides: Map[String, String] = Map.empty): ConnectionConfig = {
    def get(key: String, default: String): String =
      overrides.getOrElse(key, env.getOrElse(key, default))
    ConnectionConfig(
      dbType   = get("DB_TYPE", "derby"),
      host     = get("DB_HOSTNAME", "localhost"),
      port     = get("DB_PORT", "1527"),
      database = get("DB_DATABASE",
        s"target/derby/pid-${ProcessHandle.current().pid()}/graftdb"),
      user     = get("DB_USERNAME", get("DB_USER", "")),
      password = get("DB_PASSWORD", ""))
  }
}
