"""QC + scale operators. Each module implements one family from SURVEY.md §2
as lazy DataFrame/Column transformations (no eager execution, no driver
loops); pandas UDFs appear only where built-ins cannot express the
semantics (polygon/raster lookups, exact geodesic option).  The one
sanctioned driver loop is ``components.connected_components`` — a genuinely
iterative fixpoint where the loop is control flow and every data-touching
step remains a distributed DataFrame op."""
