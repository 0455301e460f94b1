"""Custom relational operators (SURVEY §2.C/§2.E/§2.F12) built from
DataFrame compositions — no RDDs, no driver-side row loops."""
