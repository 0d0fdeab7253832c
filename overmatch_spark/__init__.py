"""overmatch_spark — a from-scratch PySpark-native spatial conflation +
tiling engine with the query capabilities of EMH333/overmatch.

Design stance (SURVEY.md §7.0): the Spark DataFrame API is the query
language, Catalyst is the optimizer, Tungsten is the executor. This
package is a library of operators (``DataFrame -> DataFrame``), pure
Catalyst column-expression builders for all geometry math, and a single
Arrow-vectorized text-similarity kernel — zero per-row Python anywhere.
"""

__version__ = "0.1.0"
