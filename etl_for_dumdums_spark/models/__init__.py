"""Reference dbt DAG re-expressed as DataFrame model builders (see models/reference_dag.py)."""
