"""tubes_spark — a PySpark-native re-expression of the gatlin/tubes
dataflow algebra, extended with large-scale relational / LLM-data-pipeline
operators.

The reference (``/root/reference``, Haskell) exposes four abstractions:

* ``Tube``    (Tubes/Core.hs:96)      -> an unexecuted DataFrame lineage
* ``Source``  (Tubes/Source.hs:79-81) -> an input DataFrame wrapper (:class:`Source`)
* ``Sink``    (Tubes/Sink.hs:94-96)   -> a writer / consumer (:class:`Sink`)
* ``Channel`` (Tubes/Channel.hs:82-84)-> a DataFrame -> DataFrame stage (:class:`Pipe`)

Everything here is declarative DataFrame lineage: Catalyst plans it,
Tungsten runs it.  No custom interpreter exists — series composition
``><`` (Tubes/Core.hs:140-150) is literally function composition.
"""

from tubes_spark.session import get_spark
from tubes_spark.catalog import load_table, load_tables, TABLES
from tubes_spark.pipe import Pipe, cat, pmap, pfilter, run_tube
from tubes_spark.source import Source
from tubes_spark.sink import Sink

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "TABLES",
    "Pipe",
    "cat",
    "pmap",
    "pfilter",
    "run_tube",
    "Source",
    "Sink",
]

__version__ = "0.1.0"
