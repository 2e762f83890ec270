"""PySpark-native analytics engine with the query/data-processing
capabilities of CBIIT/ChildhoodCancerDataInitiative-cBioPortal-Workflows.

The reference is a Prefect orchestration repo whose data processing lives in
pandas transforms and shelled-out tools (bedtools/bcftools/mysqldump/java).
This package re-expresses every observed relational semantic as a pure
DataFrame -> DataFrame operator on Apache Spark, designed for 100 TB scale:
declarative plans (Catalyst optimizes), broadcast hints for small dims,
a binned interval join replacing bedtools, and Arrow-batched Pandas UDFs
only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
