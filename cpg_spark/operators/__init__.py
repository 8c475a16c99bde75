"""Pipeline operators: DataFrame -> DataFrame stages.

Unlike the reference's mutating passes over a shared object graph
(reference passes/Pass.kt:141, run strictly sequentially —
TranslationManager.kt:95-105), every operator here is a pure function of
immutable DataFrames, so stages parallelize and checkpoint freely.
"""
