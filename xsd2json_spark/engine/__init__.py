from xsd2json_spark.engine.validate import EngineConfig, ValidationEngine, ValidationResult  # noqa: F401
