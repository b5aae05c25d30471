"""Source readers: format dispatch, env-var credential substitution,
schema overrides."""
