package graft.queries

/** DuckDB oracles for the ontology sync gates (purl normalization,
  * Package derivation, source-merge canonical build, mutual-unique
  * linking). DuckDB has no url_decode, so the npm-scope arm decodes the
  * one escape the gate data uses (%40 → @) with replace() — the oracle
  * mirrors the gate's data contract, not a general decoder. */
private[queries] object OntologySyncOracles {

  val purlParse: String =
    """WITH rows AS (
      |  SELECT p_partkey AS k,
      |         replace(p_name, ' ', '.') AS nm,
      |         split_part(p_name, ' ', 1) AS w,
      |         '1.' || CAST(p_partkey % 9 AS VARCHAR) || '.0' AS ver
      |  FROM part)
      |SELECT k AS id,
      |  CASE k % 6 WHEN 0 THEN 'pypi' WHEN 1 THEN 'npm' WHEN 2 THEN 'deb'
      |    WHEN 3 THEN 'golang' END AS ptype,
      |  CASE k % 6 WHEN 1 THEN '@types' WHEN 2 THEN 'debian'
      |    WHEN 3 THEN 'github.com' END AS namespace,
      |  CASE k % 6 WHEN 0 THEN nm WHEN 1 THEN w WHEN 2 THEN w
      |    WHEN 3 THEN w END AS pname,
      |  CASE WHEN k % 6 <= 2 THEN ver END AS version,
      |  CASE k % 6
      |    WHEN 0 THEN 'pypi|' || regexp_replace(lower(nm), '[._-]+', '-', 'g')
      |                || '|' || ver
      |    WHEN 1 THEN 'npm|@types/' || w || '|' || ver
      |    WHEN 2 THEN 'deb|debian/' || w || '|' || ver
      |    ELSE CASE WHEN k % 5 <> 0 THEN
      |      CASE k % 3 WHEN 0 THEN 'pypi|' WHEN 1 THEN 'npm|' ELSE 'deb|' END
      |        || w || '|' || ver END
      |  END AS vid,
      |  CASE k % 6
      |    WHEN 0 THEN 'pypi|' || regexp_replace(lower(nm), '[._-]+', '-', 'g')
      |    WHEN 1 THEN 'npm|@types/' || w
      |    WHEN 2 THEN 'deb|debian/' || w
      |    WHEN 3 THEN 'golang|github.com/' || w
      |    ELSE CASE k % 3 WHEN 0 THEN 'pypi|' WHEN 1 THEN 'npm|' ELSE 'deb|' END
      |      || w
      |  END AS pid
      |FROM rows""".stripMargin

  val packages: String =
    """WITH rows AS (
      |  SELECT p_partkey AS k,
      |         CASE WHEN p_partkey % 2 = 0 THEN 'pypi' ELSE 'npm' END AS t,
      |         CAST(p_partkey % 50 AS VARCHAR) AS x,
      |         '1.' || CAST(p_partkey % 7 AS VARCHAR) || '.0' AS ver
      |  FROM part),
      |keyed AS (
      |  SELECT k, t, ver,
      |    CASE
      |      WHEN k % 3 <> 2 AND t = 'pypi' THEN 'pypi|lib-' || x
      |      WHEN k % 3 <> 2 THEN 'npm|@acme/lib.' || x
      |      WHEN k % 11 = 0 THEN NULL
      |      WHEN t = 'pypi' THEN 'pypi|lib-' || x
      |      ELSE 'npm|lib.' || x
      |    END AS pid,
      |    CASE WHEN k % 3 <> 2 AND t = 'npm' THEN '@acme' END AS ns
      |  FROM rows),
      |vids AS (
      |  SELECT pid, ns, pid || '|' || ver AS vid FROM keyed
      |  WHERE pid IS NOT NULL)
      |SELECT pid AS id,
      |  split_part(pid, '|', 1) AS type,
      |  regexp_extract(pid, '^[^|]*\|(.*)$', 1) AS name,
      |  min(ns) AS namespace,
      |  CAST(count(DISTINCT vid) AS BIGINT) AS n_versions,
      |  string_agg(DISTINCT vid, ';' ORDER BY vid) AS vids
      |FROM vids GROUP BY pid""".stripMargin

  val usersSourceMerge: String =
    """WITH src AS (
      |  SELECT CASE WHEN c_custkey % 9 = 0 THEN NULL
      |           ELSE 'u' || CAST(c_custkey % 700 AS VARCHAR) || '@corp.ex' END AS email,
      |         c_name AS fullname, c_custkey % 3 = 0 AS active,
      |         CAST(NULL AS BOOLEAN) AS has_mfa,
      |         0 AS prio, 'ms' || CAST(c_custkey AS VARCHAR) AS sid
      |  FROM customer
      |  UNION ALL
      |  -- RAW suspended rides into active on this path (no nor_boolean)
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex', n_name,
      |         CASE WHEN n_nationkey % 7 = 0 THEN NULL
      |              ELSE n_nationkey % 2 = 0 END,
      |         NULL, 1, 'gs' || CAST(n_nationkey AS VARCHAR)
      |  FROM nation
      |  UNION ALL
      |  SELECT 'u' || CAST((c_custkey + 350) % 700 AS VARCHAR) || '@corp.ex',
      |         c_name, c_custkey % 5 <> 0, NULL,
      |         2, 'sf' || CAST(c_custkey AS VARCHAR)
      |  FROM customer
      |  UNION ALL
      |  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
      |           ELSE 'u' || CAST(n_nationkey + 8 AS VARCHAR) || '@corp.ex' END,
      |         'sl ' || n_name, NULL, n_nationkey % 2 = 0,
      |         3, 'sl' || CAST(n_nationkey AS VARCHAR)
      |  FROM nation),
      |merged AS (
      |  SELECT email,
      |    first_value(fullname IGNORE NULLS) OVER w AS fullname,
      |    first_value(active IGNORE NULLS) OVER w AS active,
      |    first_value(has_mfa IGNORE NULLS) OVER w AS has_mfa,
      |    row_number() OVER (PARTITION BY email ORDER BY prio, sid) AS rk
      |  FROM src WHERE email IS NOT NULL
      |  WINDOW w AS (PARTITION BY email ORDER BY prio, sid
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT email, fullname, active, has_mfa FROM merged WHERE rk = 1""".stripMargin

  val ontologySourceRead: String =
    """WITH src AS (
      |  SELECT CASE WHEN c_custkey % 9 = 0 THEN NULL
      |           ELSE 'u' || CAST(c_custkey % 700 AS VARCHAR) || '@corp.ex' END AS email,
      |         c_name AS fullname, CAST(NULL AS VARCHAR) AS firstname,
      |         CAST(NULL AS VARCHAR) AS lastname,
      |         c_custkey % 3 = 0 AS inactive,
      |         0 AS prio, 'ms' || CAST(c_custkey AS VARCHAR) AS sid
      |  FROM customer
      |  UNION ALL
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex', NULL,
      |         'fn-' || n_name, 'ln-' || n_name,
      |         CASE WHEN n_nationkey % 7 = 0 THEN NULL
      |              ELSE n_nationkey % 2 = 0 END,
      |         1, 'gs' || CAST(n_nationkey AS VARCHAR)
      |  FROM nation
      |  UNION ALL
      |  -- okta: empty-string email is FALSY (required gate drops it)
      |  SELECT CASE WHEN s_suppkey % 11 = 0 THEN ''
      |           ELSE 'u' || CAST(s_suppkey % 300 AS VARCHAR) || '@corp.ex' END,
      |         'ok ' || s_name, NULL, 'okl-' || s_name,
      |         s_suppkey % 4 = 0,
      |         2, 'ok' || CAST(s_suppkey AS VARCHAR)
      |  FROM supplier),
      |-- slack rows exist in the canonical frame but carry an unselected
      |-- _ont_source, so the oracle never sees them
      |merged AS (
      |  SELECT email,
      |    first_value(fullname IGNORE NULLS) OVER w AS fullname,
      |    first_value(firstname IGNORE NULLS) OVER w AS firstname,
      |    first_value(lastname IGNORE NULLS) OVER w AS lastname,
      |    first_value(inactive IGNORE NULLS) OVER w AS inactive,
      |    row_number() OVER (PARTITION BY email ORDER BY prio, sid) AS rk
      |  FROM src WHERE email IS NOT NULL AND email <> ''
      |  WINDOW w AS (PARTITION BY email ORDER BY prio, sid
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |SELECT email, fullname, firstname, lastname, inactive
      |FROM merged WHERE rk = 1""".stripMargin

  val usersSync: String =
    """WITH a_ms AS (
      |  SELECT 'u' || CAST(c_custkey % 700 AS VARCHAR) || '@corp.ex' AS email,
      |         c_custkey AS k
      |  FROM customer WHERE c_custkey % 9 <> 0),
      |a_gs AS (
      |  SELECT 'u' || CAST(n_nationkey AS VARCHAR) || '@corp.ex' AS email
      |  FROM nation),
      |a_sl AS (
      |  SELECT 'u' || CAST(n_nationkey + 8 AS VARCHAR) || '@corp.ex' AS email
      |  FROM nation WHERE n_nationkey % 5 <> 0),
      |users AS (
      |  SELECT DISTINCT email FROM (
      |    SELECT email FROM a_ms UNION ALL
      |    SELECT email FROM a_gs UNION ALL
      |    SELECT email FROM a_sl)),
      |acc AS (
      |  SELECT email, count(*) AS n FROM (
      |    SELECT email FROM a_ms UNION ALL
      |    SELECT email FROM a_gs UNION ALL
      |    SELECT email FROM a_sl) GROUP BY email),
      |keys AS (
      |  SELECT a.email, count(*) AS n
      |  FROM supplier s JOIN a_ms a ON a.k = s.s_suppkey
      |  GROUP BY a.email),
      |gh AS (
      |  SELECT g.email, count(*) AS n FROM (
      |    SELECT 'u' || CAST(s_suppkey % 40 AS VARCHAR) || '@corp.ex' AS email
      |    FROM supplier
      |    UNION ALL
      |    SELECT 'u' || CAST((s_suppkey + 1) % 40 AS VARCHAR) || '@corp.ex'
      |    FROM supplier) g
      |  JOIN users u ON u.email = g.email GROUP BY g.email)
      |SELECT u.email,
      |  coalesce(a.n, 0) AS n_accounts,
      |  coalesce(k.n, 0) AS n_keys,
      |  coalesce(g.n, 0) AS n_gh
      |FROM users u
      |LEFT JOIN acc a ON a.email = u.email
      |LEFT JOIN keys k ON k.email = u.email
      |LEFT JOIN gh g ON g.email = u.email""".stripMargin

  val hostnameMatchlink: String =
    """WITH dev AS (SELECT 'h' || CAST(n_nationkey AS VARCHAR) AS h FROM nation),
      |aws AS (SELECT 'h' || CAST(r_regionkey AS VARCHAR) AS h FROM region),
      |jamf AS (SELECT 'h' || CAST(s_suppkey % 3 AS VARCHAR) AS h FROM supplier),
      |gd AS (SELECT count(DISTINCT h) = count(*) AS ok FROM dev),
      |ga AS (SELECT count(DISTINCT h) = count(*) AS ok FROM aws),
      |gj AS (SELECT count(DISTINCT h) = count(*) AS ok FROM jamf)
      |SELECT 'AwsInstance' AS label, gd.ok AND ga.ok AS guard_passed,
      |  CAST(CASE WHEN gd.ok AND ga.ok
      |    THEN (SELECT count(*) FROM dev JOIN aws USING (h)) ELSE 0 END
      |    AS BIGINT) AS n_links
      |FROM gd, ga
      |UNION ALL
      |SELECT 'JamfComputer', gd.ok AND gj.ok,
      |  CAST(CASE WHEN gd.ok AND gj.ok
      |    THEN (SELECT count(*) FROM dev JOIN jamf USING (h)) ELSE 0 END
      |    AS BIGINT)
      |FROM gd, gj""".stripMargin

  val runtimeImages: String =
    """WITH c AS (
      |  SELECT 'img' || CAST(c_custkey % 30 AS VARCHAR) AS img,
      |         c_custkey % 7 = 0 AS rexp,
      |         CASE WHEN c_custkey % 3 = 0
      |                THEN 'svc' || CAST(c_custkey % 5 AS VARCHAR)
      |              WHEN c_custkey % 3 = 1
      |                THEN 'svc' || CAST((c_custkey % 25) % 5 AS VARCHAR)
      |         END AS svc
      |  FROM customer WHERE c_custkey % 4 <> 3),
      |rt AS (
      |  SELECT svc, img, rexp FROM c WHERE svc IS NOT NULL
      |  UNION ALL
      |  SELECT 'svc' || CAST(r_regionkey AS VARCHAR),
      |         'img' || CAST(r_regionkey AS VARCHAR), false
      |  FROM region),
      |agg AS (SELECT svc, img, bool_or(rexp) AS any_rt FROM rt GROUP BY svc, img)
      |SELECT a.svc, a.img,
      |  (r.r_regionkey % 2 = 0 OR a.any_rt) AS exposed_internet
      |FROM agg a
      |JOIN region r ON a.svc = 'svc' || CAST(r.r_regionkey AS VARCHAR)""".stripMargin

  val migrations: String =
    """SELECT 'Package' AS label,
      |  CAST(count(*) FILTER (WHERE p_partkey % 4 IN (0, 2)) AS BIGINT) AS n_nodes,
      |  CAST(count(*) FILTER (WHERE p_partkey % 4 = 2) AS BIGINT) AS n_flagged
      |FROM part
      |UNION ALL
      |SELECT 'PackageVersion',
      |  CAST((SELECT count(*) FROM region)
      |    + (SELECT count(*) FROM part WHERE p_partkey % 4 IN (1, 3)) AS BIGINT),
      |  CAST((SELECT count(*) FROM region)
      |    + (SELECT count(*) FROM part WHERE p_partkey % 4 IN (1, 3)) AS BIGINT)
      |UNION ALL
      |SELECT 'SpaceliftStack',
      |  CAST((SELECT count(*) FROM nation) AS BIGINT),
      |  CAST(0 AS BIGINT)""".stripMargin

  val uniqueLink: String =
    """WITH instances AS (
      |  SELECT 'i' || CAST(s_suppkey AS VARCHAR) AS inst_id,
      |    CASE WHEN s_suppkey % 5 <> 0
      |      THEN 'node-' || CAST(s_suppkey AS VARCHAR) || '.corp.example.com'
      |      ELSE 'lb-' || CAST(s_suppkey % 7 AS VARCHAR) || '.corp.example.com'
      |    END AS hostname
      |  FROM supplier),
      |devices AS (
      |  SELECT 'd' || CAST(c_custkey AS VARCHAR) AS dev_id,
      |    CASE
      |      WHEN c_custkey % 3 = 1
      |        THEN 'NODE-' || CAST(c_custkey AS VARCHAR) || '.local'
      |      WHEN c_custkey % 3 = 2
      |        THEN 'node-' || CAST(c_custkey AS VARCHAR) || '.corp.example.com'
      |      ELSE 'lb-' || CAST(c_custkey % 7 AS VARCHAR) || '.local'
      |    END AS name
      |  FROM customer WHERE c_custkey <= 400),
      |ikeys AS (
      |  SELECT inst_id, lower(hostname) AS key FROM instances
      |  UNION
      |  SELECT inst_id, split_part(lower(hostname), '.', 1) FROM instances),
      |dkeys AS (
      |  SELECT dev_id, lower(name) AS key FROM devices
      |  UNION
      |  SELECT dev_id, split_part(lower(name), '.', 1) FROM devices),
      |cands AS (
      |  SELECT DISTINCT dev_id, inst_id
      |  FROM dkeys JOIN ikeys USING (key))
      |SELECT dev_id, inst_id FROM cands
      |QUALIFY count(*) OVER (PARTITION BY dev_id) = 1
      |    AND count(*) OVER (PARTITION BY inst_id) = 1""".stripMargin
}
