"""Large-scale training-data pipeline operators: dedup, text analysis,
similarity search, multimodal plumbing. All built-in-function-first (JVM,
whole-stage codegen); Python only in Arrow-vectorized UDFs."""
