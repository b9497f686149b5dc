"""Example AIRs (parity: ``provers/stark/src/examples/``)."""
