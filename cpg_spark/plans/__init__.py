"""Stage-DAG planning: the analog of the reference's pass scheduler
(TranslationConfiguration.orderPasses, TranslationConfiguration.kt:663-704)
— except the DAG is static and each stage is a checkpointed DataFrame
transform instead of a mutating in-place pass."""
