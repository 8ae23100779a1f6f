"""Pipeline assembly: whole-run logical plans built from the operator
registry, mirroring the reference's hand-ordered dataflow
(``src/main.py:518-805``) as ONE lazy DataFrame DAG."""
