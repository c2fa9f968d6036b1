"""The pattern-plan layer: SRE text -> logical formula -> symbolic
automaton -> (symbolizer Column, numpy SDFA) physical artifacts.

This is the engine's "query compiler" for the CEP surface.  Everything
here runs driver-side (automata are tiny); the data-sized work happens
in Spark: symbolization is one CASE-like Column expression and matching
is the operators/cep.py stateful operator.
"""

from flink_rtcef_spark.plans.compiler import CompiledPattern, compile_pattern

__all__ = ["CompiledPattern", "compile_pattern"]
