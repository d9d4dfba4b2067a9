"""SGS turbulence schemes (reference: physics/sgs)."""
