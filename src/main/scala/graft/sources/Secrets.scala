package graft.sources

/** S5 of SURVEY.md §2a: the secret source. The reference reads the
  * OpenWeather API key from Secret Manager at invocation time
  * (/root/reference/Load-Data-From-API/main.py:40-48); the engine's
  * equivalent is environment/config injection — non-relational by
  * design, isolated here so no operator ever touches credentials.
  */
object Secrets {
  val ApiKeyVar = "OPENWEATHER_API_KEY"

  /** Latest-version read, env-var analogue. `env` injectable for tests. */
  def apiKey(env: Map[String, String] = sys.env): Option[String] =
    env.get(ApiKeyVar).filter(_.nonEmpty)
}
